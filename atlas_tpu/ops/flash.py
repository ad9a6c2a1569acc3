"""Pallas TPU flash attention with in-kernel T5 relative-position bias.

Replaces the score-materializing path for the hot shapes: the reference (and our
fallback `ops.attention.dot_product_attention`) builds the full (B, H, Lq, Lk)
score/prob tensors in HBM (/root/reference/src/modeling_t5.py:367-377) — at FiD
training shapes (B*N=40, H=12, L=384+) that is hundreds of MB of HBM traffic per
layer in forward AND backward. This kernel streams K/V blocks through VMEM with an
online softmax, so scores never leave the chip.

T5 semantics preserved exactly:
- no 1/sqrt(d) query scaling (T5 folds it into the init; BERT callers pre-scale),
- additive position bias shared across the batch, shape (H, Lq, Lk), TRAINABLE —
  the backward emits d(pos_bias) via a dedicated batch-innermost accumulation kernel,
- additive key padding mask of 0 / NEG_INF (same -1e9 finite mask as the fallback, so
  fully-masked rows degrade to uniform attention in both paths),
- attention-prob dropout: counter-based in-kernel PRNG seeded per (b, h, iq, jk)
  P-block, regenerated bit-exactly by the backward kernels (no mask materialization).

Backward follows the flash-attention recipe: residuals are (out, lse); with
D = rowsum(dO * out) the score gradient is dS = P * (M ⊙ (dO Vᵀ) - D) where M is the
dropout keep/(1-rate) mask (D absorbs the dropout because out already contains it).
Three passes: dQ (k-blocks innermost), dK/dV (q-blocks innermost), and optionally
d(pos_bias) = Σ_b dS (batch innermost so the output block accumulates in VMEM).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import dtypes as jdtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
_M_INIT = -1e30


def flash_wins(attn_impl: str, lq: int, lk: int, capture: bool = False,
               deterministic: bool = False) -> bool:
    """Shared flash-vs-XLA dispatch policy (T5 and BERT towers route through
    this). The capture path needs materialized probs (fid.py:335-341) so it
    always falls back.

    Measured on v5e: training fwd+bwd at L=384 flash is 1.25-1.3x XLA (the bwd
    avoids re-materializing scores and the in-kernel PRNG avoids dropout mask
    tensors: t5-base FiD 1.3x, bert-base retriever tower 1.25x), but
    DETERMINISTIC forward-only at L<=256 flash is measurably SLOWER (t5 ~6% at
    L=256, bert 0.66x at L=192/B=512 — XLA's fused softmax is already
    bandwidth-optimal and flash pays padding + kernel overhead) — so inference
    keeps XLA until the score tensor gets big enough that avoiding its HBM
    round-trip wins."""
    if capture:
        return False
    if attn_impl == "flash":
        return True
    if attn_impl != "auto":
        return False
    if jax.default_backend() != "tpu":
        return False
    if not deterministic:  # training: fwd+bwd+dropout — flash wins from L>=128
        return lq >= 128 or lk >= 1024
    return lq >= 512 or lk >= 4096


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pick_block(length: int, cap: int = 512) -> int:
    """Single whole-length block when it fits (no online-softmax carry, the fastest
    configuration measured on v5e), else the largest 128-multiple divisor <= cap."""
    padded = max(128, -(-length // 128) * 128)
    if padded <= cap:
        return padded
    for b in (512, 384, 256, 128):
        if b <= cap and padded % b == 0:
            return b
    return 128


def _pad_axis(x: jnp.ndarray, axis: int, to: int) -> jnp.ndarray:
    cur = x.shape[axis]
    if cur == to:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, to - cur)
    return jnp.pad(x, pads)


# --------------------------------------------------------------------- in-kernel ops


def _fmix32(x):
    """murmur3 finalizer: a full-avalanche 32-bit mix (uint32 ops, wrapping)."""
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _keep_mask(seed, b, h, num_heads, iq, jk, bq, bk, lk_total, rate: float):
    """Deterministic dropout keep mask, scaled by 1/(1-rate).

    Counter-based (no stateful PRNG): bits = fmix(fmix(seed ^ fmix(b*H+h)) ^ elem)
    where elem is the ABSOLUTE (row, col) score coordinate — so forward and all three
    backward kernels regenerate identical masks regardless of their grid layouts, and
    the same code runs compiled on TPU and under interpret mode on CPU.
    """
    row = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    col = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    elem = row.astype(jnp.uint32) * jnp.asarray(lk_total, jnp.uint32) + col.astype(jnp.uint32)
    plane = (b * num_heads + h).astype(jnp.uint32) + np.uint32(0x9E3779B9)
    key = _fmix32(seed.astype(jnp.uint32) ^ _fmix32(plane))
    bits = _fmix32(key ^ elem)
    # Mosaic has no uint32->f32 cast; >>8 fits in int31 so go through int32.
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.where(u >= rate, 1.0 / (1.0 - rate), 0.0)


def _scores(q, k, bias_ref, mask_ref, causal, bq, bk, iq, jk):
    """(bq, bk) fp32 raw scores: q kᵀ + pos_bias + key mask + causal mask."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)
    if mask_ref is not None:
        s = s + mask_ref[0].astype(jnp.float32)  # (1, bk) broadcasts over rows
    if causal:
        qpos = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        kpos = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = s + jnp.where(qpos >= kpos, 0.0, NEG_INF)
    return s


# ------------------------------------------------------------------------ fwd kernel


def _make_fwd_kernel(causal, rate, has_bias, has_mask, bq, bk, nk):
    def kernel(*refs):
        i = 0
        seed_ref = None
        if rate > 0.0:
            seed_ref, i = refs[0], 1
        q_ref, k_ref, v_ref = refs[i : i + 3]
        i += 3
        bias_ref = refs[i] if has_bias else None
        i += int(has_bias)
        mask_ref = refs[i] if has_mask else None
        i += int(has_mask)
        o_ref, lse_ref, m_scr, l_scr, acc_scr = refs[i : i + 5]

        b, h, iq, jk = (pl.program_id(d) for d in range(4))

        @pl.when(jk == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, _M_INIT)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = _scores(q, k, bias_ref, mask_ref, causal, bq, bk, iq, jk)

        m_prev = m_scr[:, 0:1]
        l_prev = l_scr[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # (bq, bk) fp32, unnormalized
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        if rate > 0.0:
            keep = _keep_mask(seed_ref[0], b, h, pl.num_programs(1), iq, jk,
                              bq, bk, bk * pl.num_programs(3), rate)
            p_v = p * keep
        else:
            p_v = p
        pv = jax.lax.dot_general(
            p_v.astype(v_ref.dtype),
            v_ref[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

        @pl.when(jk == nk - 1)
        def _():
            o_ref[0, 0] = (acc_scr[:] / l_scr[:, 0:1]).astype(o_ref.dtype)
            lse_ref[0, 0] = m_scr[:, 0:1] + jnp.log(l_scr[:, 0:1])

    return kernel


def _fwd_call(q, k, v, pos_bias, mask_bias, seed, causal, rate, bq, bk, interpret):
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    nq, nk = Lq // bq, Lk // bk
    has_bias, has_mask = pos_bias is not None, mask_bias is not None

    grid = (B, H, nq, nk)
    in_specs, args = [], []
    if rate > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.reshape(seed, (1,)).astype(jnp.int32))
    in_specs += [
        pl.BlockSpec((1, 1, bq, Dh), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, bk, Dh), lambda b, h, i, j: (b, h, j, 0)),
        pl.BlockSpec((1, 1, bk, Dh), lambda b, h, i, j: (b, h, j, 0)),
    ]
    args += [q, k, v]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bq, bk), lambda b, h, i, j: (h, i, j)))
        args.append(pos_bias)
    if has_mask:
        in_specs.append(pl.BlockSpec((1, 1, bk), lambda b, h, i, j: (b, 0, j)))
        args.append(mask_bias)

    out, lse = pl.pallas_call(
        _make_fwd_kernel(causal, rate, has_bias, has_mask, bq, bk, nk),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq, Dh), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Lq, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, Dh), jnp.float32),
        ],
        interpret=bool(interpret),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * Lk * Dh,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Lq * Lk,
        ),
    )(*args)
    return out, lse


# ----------------------------------------------------------------------- bwd kernels


def _make_dq_kernel(causal, rate, has_bias, has_mask, bq, bk, nk):
    def kernel(*refs):
        i = 0
        seed_ref = None
        if rate > 0.0:
            seed_ref, i = refs[0], 1
        q_ref, k_ref, v_ref = refs[i : i + 3]
        i += 3
        bias_ref = refs[i] if has_bias else None
        i += int(has_bias)
        mask_ref = refs[i] if has_mask else None
        i += int(has_mask)
        do_ref, lse_ref, dcap_ref, dq_ref, dq_scr = refs[i : i + 5]

        b, h, iq, jk = (pl.program_id(d) for d in range(4))

        @pl.when(jk == 0)
        def _():
            dq_scr[:] = jnp.zeros_like(dq_scr)

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = _scores(q, k, bias_ref, mask_ref, causal, bq, bk, iq, jk)
        p = jnp.exp(s - lse_ref[0, 0])  # true softmax probs, fp32
        dp = jax.lax.dot_general(
            do_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            dp = dp * _keep_mask(seed_ref[0], b, h, pl.num_programs(1), iq, jk,
                                 bq, bk, bk * pl.num_programs(3), rate)
        ds = p * (dp - dcap_ref[0, 0])
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(jk == nk - 1)
        def _():
            dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)

    return kernel


def _make_dkv_kernel(causal, rate, has_bias, has_mask, bq, bk, nq):
    def kernel(*refs):
        i = 0
        seed_ref = None
        if rate > 0.0:
            seed_ref, i = refs[0], 1
        q_ref, k_ref, v_ref = refs[i : i + 3]
        i += 3
        bias_ref = refs[i] if has_bias else None
        i += int(has_bias)
        mask_ref = refs[i] if has_mask else None
        i += int(has_mask)
        do_ref, lse_ref, dcap_ref, dk_ref, dv_ref, dk_scr, dv_scr = refs[i : i + 7]

        b, h, jk, iq = (pl.program_id(d) for d in range(4))

        @pl.when(iq == 0)
        def _():
            dk_scr[:] = jnp.zeros_like(dk_scr)
            dv_scr[:] = jnp.zeros_like(dv_scr)

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        do = do_ref[0, 0]
        s = _scores(q, k, bias_ref, mask_ref, causal, bq, bk, iq, jk)
        p = jnp.exp(s - lse_ref[0, 0])
        keep = (
            _keep_mask(seed_ref[0], b, h, pl.num_programs(1), iq, jk,
                       bq, bk, bk * pl.num_programs(2), rate)
            if rate > 0.0 else None
        )
        p_d = p * keep if keep is not None else p
        dv_scr[:] += jax.lax.dot_general(
            p_d.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - dcap_ref[0, 0])
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(iq == nq - 1)
        def _():
            dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)

    return kernel


def _make_dbias_kernel(causal, rate, has_mask, bq, bk):
    def kernel(*refs):
        i = 0
        seed_ref = None
        if rate > 0.0:
            seed_ref, i = refs[0], 1
        q_ref, k_ref, v_ref, bias_ref = refs[i : i + 4]
        i += 4
        mask_ref = refs[i] if has_mask else None
        i += int(has_mask)
        do_ref, lse_ref, dcap_ref, db_ref = refs[i : i + 4]

        h, iq, jk, b = (pl.program_id(d) for d in range(4))

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = _scores(q, k, bias_ref, mask_ref, causal, bq, bk, iq, jk)
        p = jnp.exp(s - lse_ref[0, 0])
        dp = jax.lax.dot_general(
            do_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            dp = dp * _keep_mask(seed_ref[0], b, h, pl.num_programs(0), iq, jk,
                                 bq, bk, bk * pl.num_programs(2), rate)
        ds = p * (dp - dcap_ref[0, 0])

        @pl.when(b == 0)
        def _():
            db_ref[0] = ds

        @pl.when(b > 0)
        def _():
            db_ref[0] = db_ref[0] + ds

    return kernel


def _bwd_call(res, g, causal, rate, bq, bk, interpret, bias_grad):
    q, k, v, pos_bias, mask_bias, seed, out, lse = res
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    nq, nk = Lq // bq, Lk // bk
    has_bias, has_mask = pos_bias is not None, mask_bias is not None
    do = g.astype(q.dtype)
    dcap = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)

    interp = bool(interpret)
    seed_args, seed_specs = [], []
    if rate > 0.0:
        seed_args = [jnp.reshape(seed, (1,)).astype(jnp.int32)]
        seed_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]

    def qspec(f):  # (1,1,bq,Dh) at q-block index produced by f(b,h,i,j)->(b,h,i)
        return pl.BlockSpec((1, 1, bq, Dh), lambda *a: (*f(*a), 0))

    def kspec(f):
        return pl.BlockSpec((1, 1, bk, Dh), lambda *a: (*f(*a), 0))

    def rowspec(f):  # (1,1,bq,1) lse/D blocks
        return pl.BlockSpec((1, 1, bq, 1), lambda *a: (*f(*a), 0))

    # ---- dq: grid (B, H, nq, nk), k innermost
    fq = lambda b, h, i, j: (b, h, i)
    fk = lambda b, h, i, j: (b, h, j)
    in_specs = seed_specs + [qspec(fq), kspec(fk), kspec(fk)]
    args = seed_args + [q, k, v]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bq, bk), lambda b, h, i, j: (h, i, j)))
        args.append(pos_bias)
    if has_mask:
        in_specs.append(pl.BlockSpec((1, 1, bk), lambda b, h, i, j: (b, 0, j)))
        args.append(mask_bias)
    in_specs += [qspec(fq), rowspec(fq), rowspec(fq)]
    args += [do, lse, dcap]
    dq = pl.pallas_call(
        _make_dq_kernel(causal, rate, has_bias, has_mask, bq, bk, nk),
        grid=(B, H, nq, nk),
        in_specs=in_specs,
        out_specs=qspec(fq),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, Dh), jnp.float32)],
        interpret=interp,
    )(*args)

    # ---- dk/dv: grid (B, H, nk, nq), q innermost
    gq = lambda b, h, j, i: (b, h, i)
    gk = lambda b, h, j, i: (b, h, j)
    in_specs = seed_specs + [qspec(gq), kspec(gk), kspec(gk)]
    args = seed_args + [q, k, v]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bq, bk), lambda b, h, j, i: (h, i, j)))
        args.append(pos_bias)
    if has_mask:
        in_specs.append(pl.BlockSpec((1, 1, bk), lambda b, h, j, i: (b, 0, j)))
        args.append(mask_bias)
    in_specs += [qspec(gq), rowspec(gq), rowspec(gq)]
    args += [do, lse, dcap]
    dk, dv = pl.pallas_call(
        _make_dkv_kernel(causal, rate, has_bias, has_mask, bq, bk, nq),
        grid=(B, H, nk, nq),
        in_specs=in_specs,
        out_specs=[kspec(gk), kspec(gk)],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype), jax.ShapeDtypeStruct(v.shape, v.dtype)],
        scratch_shapes=[pltpu.VMEM((bk, Dh), jnp.float32), pltpu.VMEM((bk, Dh), jnp.float32)],
        interpret=interp,
    )(*args)

    # ---- d(pos_bias): grid (H, nq, nk, B), batch innermost (VMEM revisit accumulate)
    dbias = None
    if has_bias and bias_grad:
        hq = lambda h, i, j, b: (b, h, i)
        hk = lambda h, i, j, b: (b, h, j)
        in_specs = seed_specs + [
            qspec(hq), kspec(hk), kspec(hk),
            pl.BlockSpec((1, bq, bk), lambda h, i, j, b: (h, i, j)),
        ]
        args = seed_args + [q, k, v, pos_bias]
        if has_mask:
            in_specs.append(pl.BlockSpec((1, 1, bk), lambda h, i, j, b: (b, 0, j)))
            args.append(mask_bias)
        in_specs += [qspec(hq), rowspec(hq), rowspec(hq)]
        args += [do, lse, dcap]
        dbias = pl.pallas_call(
            _make_dbias_kernel(causal, rate, has_mask, bq, bk),
            grid=(H, nq, nk, B),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bq, bk), lambda h, i, j, b: (h, i, j)),
            out_shape=jax.ShapeDtypeStruct(pos_bias.shape, jnp.float32),
            interpret=interp,
        )(*args)
    elif has_bias:
        dbias = jnp.zeros_like(pos_bias)

    return dq, dk, dv, dbias


# ---------------------------------------------------------------------- custom_vjp


@functools.lru_cache(maxsize=None)
def _make_flash_fn(causal, rate, bq, bk, interpret, bias_grad):
    @jax.custom_vjp
    def f(q, k, v, pos_bias, mask_bias, seed):
        out, _ = _fwd_call(q, k, v, pos_bias, mask_bias, seed, causal, rate, bq, bk, interpret)
        return out

    def f_fwd(q, k, v, pos_bias, mask_bias, seed):
        out, lse = _fwd_call(q, k, v, pos_bias, mask_bias, seed, causal, rate, bq, bk, interpret)
        return out, (q, k, v, pos_bias, mask_bias, seed, out, lse)

    def f_bwd(res, g):
        dq, dk, dv, dbias = _bwd_call(res, g, causal, rate, bq, bk, interpret, bias_grad)
        mask_bias = res[4]
        dmask = jnp.zeros_like(mask_bias) if mask_bias is not None else None
        seed = res[5]
        dseed = np.zeros(np.shape(seed), jdtypes.float0) if seed is not None else None
        return dq, dk, dv, dbias, dmask, dseed

    f.defvjp(f_fwd, f_bwd)
    return f


def flash_attention(
    q: jnp.ndarray,  # (B, H, Lq, Dh)
    k: jnp.ndarray,  # (B, H, Lk, Dh)
    v: jnp.ndarray,  # (B, H, Lk, Dh)
    pos_bias: Optional[jnp.ndarray] = None,  # (H, Lq, Lk) additive, trainable
    kv_mask: Optional[jnp.ndarray] = None,  # (B, Lk) bool/int key validity
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    bias_grad: bool = True,
) -> jnp.ndarray:
    """T5-semantics fused attention; drop-in for the bias-composed fallback path.

    Pads Lq/Lk to block multiples internally (padded keys are masked, padded query
    rows sliced off) and differentiates through q/k/v and pos_bias.
    """
    if interpret is None:
        interpret = _interpret_default()
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    bq = block_q or _pick_block(Lq)
    bk = block_k or _pick_block(Lk)
    Lqp, Lkp = -(-Lq // bq) * bq, -(-Lk // bk) * bk

    qp = _pad_axis(q, 2, Lqp)
    kp = _pad_axis(k, 2, Lkp)
    vp = _pad_axis(v, 2, Lkp)
    bias_p = None
    if pos_bias is not None:
        bias_p = _pad_axis(_pad_axis(pos_bias.astype(jnp.float32), 1, Lqp), 2, Lkp)
    mask_p = None
    if kv_mask is not None or Lkp != Lk:
        valid = kv_mask.astype(bool) if kv_mask is not None else jnp.ones((B, Lk), bool)
        mask_p = jnp.where(_pad_axis(valid, 1, Lkp), 0.0, NEG_INF).astype(jnp.float32)
        mask_p = mask_p[:, None, :]  # (B, 1, Lkp): TPU blocks need >=2 trailing dims

    rate = float(dropout_rate)
    seed = None
    if rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.randint(dropout_rng, (), 0, np.int32(2**31 - 1), dtype=jnp.int32)
    else:
        rate = 0.0

    fn = _make_flash_fn(causal, rate, bq, bk, bool(interpret), bool(bias_grad))
    out = fn(qp, kp, vp, bias_p, mask_p, seed)
    return out[:, :, :Lq]
