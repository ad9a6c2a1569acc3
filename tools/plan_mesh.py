#!/usr/bin/env python
"""Print recommended device meshes for each Atlas reader size (train + serve).

Analytic HBM accounting from atlas_tpu/parallel/geometry.py — the same specs
the train loop places params with, so the recommendation moves with the code.
The reference answers these questions by OOM-hunting on 8xV100/A100 hosts
(/root/reference/example_scripts/nq/train.sh:3-14, README_MMLU.md:73).

  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/plan_mesh.py [chip]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from atlas_tpu.parallel.geometry import (  # noqa: E402
    CHIP_HBM_GIB, plan_decode_memory, plan_train_memory)

READERS = ["t5-base", "t5-large", "google/t5-xl-lm-adapt", "google/t5-xxl-lm-adapt"]
CHIP = sys.argv[1] if len(sys.argv) > 1 else "v5e"


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


if __name__ == "__main__":
    main()
