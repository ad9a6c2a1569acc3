#!/usr/bin/env python
"""Print recommended device meshes for each Atlas reader size (train + serve).

Analytic HBM accounting from atlas_tpu/parallel/geometry.py — the same specs
the train loop places params with, so the recommendation moves with the code.
The reference answers these questions by OOM-hunting on 8xV100/A100 hosts
(/root/reference/example_scripts/nq/train.sh:3-14, README_MMLU.md:73).

  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/plan_mesh.py [chip]

--verify AOT-compiles the production train + decode steps at xl dims over a
virtual 8-device mesh and prints planner-vs-XLA bytes side by side (the
sharding-determined argument bytes must agree within 15%; exits 1 otherwise —
see parallel/aot.py for what is asserted and why temp is report-only):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
    PYTHONPATH=/root/repo python tools/plan_mesh.py v5e --verify
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from atlas_tpu.parallel.geometry import (  # noqa: E402
    CHIP_HBM_GIB, plan_decode_memory, plan_train_memory)

READERS = ["t5-base", "t5-large", "google/t5-xl-lm-adapt", "google/t5-xxl-lm-adapt"]
ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
CHIP = ARGS[0] if ARGS else "v5e"
VERIFY = "--verify" in sys.argv


def first_fit_train(reader):
    for mp in (1, 2, 4, 8):
        for dp in (1, 2, 4, 8, 16, 32):
            p = plan_train_memory(reader, dp=dp, mp=mp)
            if p.fits(CHIP):
                return p
    return None


def first_fit_decode(reader, **kw):
    for mp in (1, 2, 4, 8):
        p = plan_decode_memory(reader, mp=mp, **kw)
        if p.fits(CHIP):
            return p
    return None


def main():
    print(f"chip: {CHIP} ({CHIP_HBM_GIB[CHIP]:.0f} GiB HBM/chip)\n")
    print(f"{'reader':28s} {'train (FSDP dp x TP mp)':>26s} {'GiB/dev':>8s} "
          f"{'serve (mp)':>11s} {'GiB/dev':>8s}")
    for r in READERS:
        t = first_fit_train(r)
        d = first_fit_decode(r, batch=8, n_context=20, text_len=256, max_len=32)
        d8 = d or first_fit_decode(r, batch=8, n_context=20, text_len=256,
                                   max_len=32, weights="int8")
        tcol = f"dp={t.dp} mp={t.mp}" if t else ">tested meshes"
        tg = f"{t.total_gib:7.1f}" if t else "      -"
        dcol = (f"mp={d8.mp}" + (" w8" if d is None else "")) if d8 else "-"
        dg = f"{d8.total_gib:7.1f}" if d8 else "      -"
        print(f"{r:28s} {tcol:>26s} {tg:>8s} {dcol:>11s} {dg:>8s}")

    if VERIFY:
        verify()


def verify():
    """Planner vs XLA side-by-side at xl dims (8 virtual devices)."""
    from atlas_tpu.parallel.aot import verify_decode_plan, verify_train_plan

    print("\ncompiler verification (xl dims, dp=4 x mp=2 virtual mesh):")
    print(f"{'step':28s} {'planner GiB':>12s} {'XLA arg GiB':>12s} "
          f"{'XLA temp':>9s} {'ratio':>6s}")
    t = verify_train_plan("google/t5-v1_1-xl", dp=4, mp=2)
    print(f"{'train xl (state/arg)':28s} {t['planner_state_gib']:12.2f} "
          f"{t['xla_arg_gib']:12.2f} {t['xla_temp_gib']:9.2f} {t['ratio']:6.3f}")
    d = verify_decode_plan("google/t5-xl-lm-adapt", mp=1, batch=8,
                           n_context=20, text_len=256, max_len=32)
    print(f"{'decode xl (weights/arg)':28s} {d['planner_weights_gib']:12.2f} "
          f"{d['xla_arg_gib']:12.2f} {d['xla_temp_gib']:9.2f} {d['ratio']:6.3f}")
    print("ok: sharding-determined bytes agree within 15%")


if __name__ == "__main__":
    main()
