"""Single-kernel fused decoder step: all nL decoder layers (+ lm head) per token.

Why: the incremental decode step at small batch is CRITICAL-PATH bound, not
bandwidth bound. Measured on v5e (t5-base FiD, B=8, N=20, L=256, int8 cross
cache): 4.16 ms/token against a ~1.3 ms DMA floor; the gap is ~80 non-fused XLA
ops each paying fixed dispatch/ramp cost, and every pallas_call adds ~13-20 us
launch overhead (which is why streaming INDIVIDUAL matmuls through Pallas
measured neutral — ops/decode_matmul.py docstring). The only structure that
removes both is ONE kernel per token: a flat sequential grid that walks
  [qkv x NQ | self-attn | self_o x NP | cross_q x NP | cross-attn x NC |
   finalize+cross_o x NP | ffn x NF]
for every layer, then lm-head blocks, carrying the residual stream in VMEM
scratch. Weights and KV caches stream through the normal Pallas block pipeline;
small models run NQ = NP = 1 (whole projection matrices per phase), 3B-class
readers (D = I = 2048) stream the attention projections in blocks like the FFN
(blk_q3 chunks qkv's output rows; blk_i chunks cross_q's output rows and
self_o/cross_o's contraction columns, partials accumulating into the residual).

Design rules (learned against the Mosaic verifier):
- The residual stream lives TRANSPOSED, (D, B): activations are columns. Every
  matmul is then a standard (M, K) @ (K, N) against a PRE-TRANSPOSED weight
  stack (built once per generate() in models/t5.py _build_fused_cache), so no
  in-kernel transposes exist at all.
- At M=1 per (batch, head), attention is a matvec; the MXU would waste >10x on
  padding, so scores/values run on the VPU: caches store vectors as COLUMNS
  grouped per batch row, shape (nL, B*I, Lk) with row index b*I + h*Dh + d
  (cross caches carry Bc = B/K rows — beams share a batch row's cross cache).
  Scores are an elementwise product against the query column broadcast over
  lanes, reduced over each Dh-sublane group.
- Vector registers with nonzero LANE offsets are never created (Mosaic refuses
  to concat/assemble them): a lane is extracted as sum(x * (iota == b)) and
  assembled as sum_b broadcast(col_b) * (iota == b); per-(b, h) operands use 3D
  layouts indexed on the leading axis; sublane slices stay at multiples of 8.

int8 cross cache: codes quantized per key vector (models/t5.py
init_decode_cache); scales keep shape (nL, B, H, Lk) so the kernel reads a
clean (H, blk) tile per batch row. Score rescale and prob-side v-scale folding
match the XLA int8 decode path formula for formula.

Reference role: the per-token cost inside HF generate() that the reference
pays via /root/reference/src/atlas.py:592-636. See CLAUDE.md "Measured
performance" for the step breakdown this design is built against.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e9

# Auto-fusion VMEM budget (v5e has ~128MiB; headroom for Mosaic's own staging).
# models/t5.py _fused_dims shrinks stream blocks to fit under this before the
# gate gives up and falls back to the XLA scan step.
FUSED_VMEM_BUDGET = 108 * 1024 * 1024


class FusedDims(NamedTuple):
    """Static geometry of the fused step (hashable; drives phase layout).

    B is the QUERY batch (residual-stream columns). With beam search, B = Bc*K
    query rows share Bc cross-cache rows (beams of a batch row attend to the
    same encoder states — the cross-cache dedup the XLA beam path also does);
    the kernel maps query row b to cross row b // K statically.

    NOTE: beam (K>1) is reachable only under decode_fused="on" — measured on
    v5e it LOSES to the XLA beam step (see models/t5.py:_fused_decode_ok), so
    the auto gate keeps the fused path greedy-only."""

    nL: int
    B: int
    D: int  # d_model
    H: int  # heads
    Dh: int  # d_kv
    F: int  # d_ff
    V: int  # vocab (padded to blk_v)
    Lk: int  # cross length (padded to blk_l)
    Tmax: int  # self-cache length (padded to lane tile)
    blk_l: int
    blk_f: int
    blk_v: int
    gated: bool
    tied: bool
    int8: bool
    dtype: Any  # compute dtype
    K: int = 1  # beams per cross row
    # Attention-projection stream blocks (0 = whole matrix, the small-model
    # geometry). For 3B-class readers (D = I = 2048) the six full (D, I)
    # projections double-buffered are ~96MiB of VMEM on their own, so they
    # stream in blocks like the FFN: blk_q3 chunks the qkv stack's 3I output
    # rows, blk_i chunks cross_q's I output rows AND self_o/cross_o's I
    # contraction columns (partial products accumulate into the residual).
    blk_q3: int = 0
    blk_i: int = 0
    # Weight-only int8: stacks stored int8 with per-OUTPUT-CHANNEL f32 scales
    # (models/t5.py _build_fused_cache). The decode step is weight-bandwidth
    # bound at small batch, so halving the weight bytes read per token is a
    # direct win; blocks are cast to the compute dtype in-kernel right before
    # the MXU and the matmul result is rescaled by the output-row scale column.
    int8w: bool = False

    @property
    def I(self) -> int:  # noqa: E743 - inner dim
        return self.H * self.Dh

    @property
    def BQ3(self) -> int:  # qkv row-block (over the 3I axis)
        return self.blk_q3 or 3 * self.I

    @property
    def BI(self) -> int:  # projection block (over the I axis)
        return self.blk_i or self.I

    @property
    def Bc(self) -> int:  # cross-cache rows
        return self.B // self.K

    @property
    def NC(self) -> int:
        return self.Lk // self.blk_l

    @property
    def NF(self) -> int:
        return self.F // self.blk_f

    @property
    def NV(self) -> int:
        return self.V // self.blk_v

    @property
    def NQ(self) -> int:  # qkv sub-phases
        return 3 * self.I // self.BQ3

    @property
    def NP(self) -> int:  # self_o / cross_q / cross_o sub-phases
        return self.I // self.BI

    @property
    def NPH(self) -> int:
        # qkv x NQ, self, self_o x NP, cross_q x NP, cross x NC,
        # fin/cross_o x NP, ffn x NF
        return self.NQ + 1 + 3 * self.NP + self.NC + self.NF

    @property
    def total_steps(self) -> int:
        return self.nL * self.NPH + self.NV

    # phase ids within a layer
    PH_QKV0 = 0

    @property
    def PH_SELF(self) -> int:
        return self.NQ

    @property
    def PH_SO0(self) -> int:  # self_o contraction sub-phases
        return self.NQ + 1

    @property
    def PH_CQ0(self) -> int:  # cross_q output sub-phases
        return self.NQ + 1 + self.NP

    @property
    def PH_CROSS0(self) -> int:
        return self.NQ + 1 + 2 * self.NP

    @property
    def PH_FIN0(self) -> int:  # finalize + cross_o contraction sub-phases
        return self.PH_CROSS0 + self.NC

    @property
    def PH_FFN0(self) -> int:
        return self.PH_FIN0 + self.NP


def _pick_block(n: int, target: int) -> int:
    """Largest multiple of 128 <= target dividing n (n must be a multiple of 128)."""
    best = 128
    for cand in range(128, min(n, target) + 1, 128):
        if n % cand == 0:
            best = cand
    return best


def pad_lk(lk: int) -> int:
    """Cross-length padding: 512-multiples past 512 (blk_l granularity), else 128."""
    return -(-lk // 512) * 512 if lk > 512 else -(-lk // 128) * 128


def pad_tmax(max_len: int) -> int:
    """Self-cache length padding: 128-lane multiples, minimum one tile."""
    return max(128, -(-max_len // 128) * 128)


def pad_vocab(v: int) -> int:
    """LM-head vocab padding: 2048-multiples past 2048 (blk_v), else 128."""
    return -(-v // 2048) * 2048 if v > 2048 else -(-v // 128) * 128


def fused_vmem_bytes(d: FusedDims) -> int:
    """Rough VMEM footprint: streamed blocks double-buffered + scratch. Used by
    the auto gate (models/t5.py _fused_decode_ok) to fall back to the XLA scan
    step for shapes that would blow the ~128MB v5e VMEM (3B+ readers, huge
    batch, beam x bf16 cross cache)."""
    dt = jnp.dtype(d.dtype).itemsize
    cs = 1 if d.int8 else dt
    wdt = 1 if d.int8w else dt  # weight-only int8 halves the streamed blocks
    I, D = d.I, d.D
    # qkv row block + self_o/cross_o contraction blocks + cross_q row block
    w = (d.BQ3 * D + 3 * D * d.BI) * wdt * 2
    w += ((2 + d.gated) * d.blk_f * D + d.blk_v * D) * wdt * 2
    w += D * 128 * dt * 2  # lnsT block: (D, 8) occupies full 128-lane tiles
    if d.int8w:
        # per-output-channel scale tables: logically 8 lanes wide, but VMEM
        # tiles are 128 lanes regardless (same correction as `lanes` below)
        w += (d.BQ3 + d.BI + D + d.blk_f + d.blk_v) * 128 * 4 * 2
    self_b = d.B * I * d.Tmax * dt * 8  # k+v, in+out buffers, double-buffered
    cross_b = d.Bc * I * d.blk_l * cs * 4
    scale_b = d.Bc * d.H * d.blk_l * 4 * 4 if d.int8 else 0
    lanes = max(d.B, 128)  # VMEM tiles are 128 lanes wide regardless of B
    scratch = lanes * (D * 4 + 3 * I * dt + 2 * I * 4 + d.H * 8 + D * dt)
    misc = d.B * d.H * d.Tmax * 4 + d.Bc * d.blk_l * 4 * 2 + d.blk_v * lanes * 4 * 2
    return w + self_b + cross_b + scale_b + scratch + misc


def _split_lp(s, d: FusedDims):
    """step -> (layer, phase) as traced index arithmetic (epilogue clamps)."""
    l = jnp.minimum(s // d.NPH, d.nL - 1)
    ph = s - l * d.NPH  # >= NPH during the epilogue
    return l, ph


# ------------------------------------------------------------- lane utilities


def _take_lane(x, b: int, out_dtype=None):
    """(R, C) -> (R, 1): column b, extracted at lane offset 0 (mask + reduce)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    picked = jnp.where(lane == b, x.astype(jnp.float32), 0.0)
    out = jnp.sum(picked, axis=1, keepdims=True)
    return out.astype(out_dtype or x.dtype)


def _take_row(x, b: int):
    """(R, C) -> (1, C) f32: row b at sublane offset 0 (mask + reduce)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    picked = jnp.where(sub == b, x.astype(jnp.float32), 0.0)
    return jnp.sum(picked, axis=0, keepdims=True)


def _put_lanes(cols, n_lanes: int):
    """[(R, 1) f32] -> (R, n_lanes) f32: column i of the output is cols[i]."""
    R = cols[0].shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, n_lanes), 1)
    out = jnp.zeros((R, n_lanes), jnp.float32)
    for i, c in enumerate(cols):
        out = out + jnp.where(lane == i, jnp.broadcast_to(c.astype(jnp.float32), (R, n_lanes)), 0.0)
    return out


def _rms_cols(xT, w_col, eps):
    """RMSNorm over the SUBLANE (feature) axis of a (D, B) column block.
    w_col: (D, 1) scale column. Matches models/t5.py rms_norm numerics."""
    xf = xT.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=0, keepdims=True)  # (1, B)
    xn = xf * jax.lax.rsqrt(var + eps)
    return (xn.astype(w_col.dtype) * w_col).astype(w_col.dtype)


def _scores_b(k_blk, q_col, d: FusedDims):
    """(I, BLK) cache block x (I, 1) query column -> (H, BLK) f32 scores,
    reduced over each Dh sublane group. Pure VPU."""
    prod = (k_blk.astype(d.dtype) * jnp.broadcast_to(q_col, k_blk.shape)).astype(
        jnp.float32
    )
    return prod.reshape(d.H, d.Dh, -1).sum(axis=1)


def _values_b(v_blk, p, d: FusedDims):
    """probs (H, BLK) f32 x cache block (I, BLK) -> (I, 1) f32 partial output."""
    pexp = jnp.broadcast_to(
        p.reshape(d.H, 1, -1), (d.H, d.Dh, p.shape[-1])
    ).reshape(d.I, -1)
    return (v_blk.astype(jnp.float32) * pexp).sum(axis=1, keepdims=True)


def _make_kernel(d: FusedDims):
    eps = 1e-6

    def kernel(
        # scalar prefetch
        pos_ref,  # (1,) int32
        # inputs (blocked)
        xT_ref,  # (D, B) embedded token columns
        wqkvT_ref,  # (1, BQ3, D) qkv row block
        lnsT_ref,  # (1, D, 8) cols 0..3 = ln1, ln2, ln3, final_ln
        sk_ref,  # (1, B*I, Tmax)
        sv_ref,  # (1, B*I, Tmax)
        sbias_ref,  # (B, H, Tmax) f32 (rel-pos row + causal mask for this pos)
        wsoT_ref,  # (1, D, BI) self_o transposed, contraction block
        wcqT_ref,  # (1, BI, D) cross_q transposed, row block
        ck_ref,  # (1, Bc*I, blk_l) cache codes (int8 or compute dtype)
        cv_ref,  # (1, Bc*I, blk_l)
        ks_ref,  # (1, Bc, H, blk_l) f32 (int8 only; dummy otherwise)
        vs_ref,  # (1, Bc, H, blk_l) f32
        cbias_ref,  # (Bc, blk_l) f32
        wcoT_ref,  # (1, D, BI) cross_o transposed, contraction block
        wiT_ref,  # (1, blk_f, D)
        wi1T_ref,  # (1, blk_f, D) (gated only; dummy otherwise)
        woT_ref,  # (1, D, blk_f)
        wlm_ref,  # (blk_v, D) — shared as-is (tied) / lm_head transposed
        # per-output-channel weight scales, f32 x 8 lanes (int8w only; dummies
        # otherwise). sD lanes: 0 = self_o, 1 = cross_o, 2 = wo. sF: 0 = wi,
        # 1 = wi_1.
        sqkv_ref,  # (1, BQ3, 8)
        scq_ref,  # (1, BI, 8)
        sD_ref,  # (1, D, 8)
        sF_ref,  # (1, blk_f, 8)
        slm_ref,  # (blk_v, 8)
        # outputs
        logitsT_ref,  # (blk_v, B) f32
        sk_out_ref,  # (1, B*I, Tmax) aliased
        sv_out_ref,  # (1, B*I, Tmax) aliased
        # scratch
        xT_scr,  # (D, B) f32 residual stream columns
        qkvT_scr,  # (3I, B) compute-dtype (cross q parks in rows 0:I after PROJ)
        outT_scr,  # (I, B) f32 attention output columns
        m_scr,  # (H, B) f32 flash max, one lane per query row
        l_scr,  # (H, B) f32 flash denom
        acc_scr,  # (I, B) f32 flash value accumulator
        hT_scr,  # (D, B) compute-dtype (ffn input columns)
    ):
        s = pl.program_id(0)
        l, ph = _split_lp(s, d)
        pos = pos_ref[0]
        B, D, H, Dh, I = d.B, d.D, d.H, d.Dh, d.I
        cdt = d.dtype

        def mm(a, b):  # standard (M,K)@(K,N) -> f32
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

        def ln_col(j):  # (D, 1) compute-dtype scale column
            return _take_lane(lnsT_ref[0], j, cdt)

        def wmm(w, x, s=None, lane=0):
            """Weight-block matmul: int8w casts the block to the compute dtype
            and rescales result rows by the output-channel scale column."""
            if d.int8w:
                return mm(w.astype(cdt), x) * _take_lane(s, lane)  # (M,1) bcast
            return mm(w, x)

        @pl.when(s == 0)
        def _init():
            xT_scr[:] = xT_ref[:].astype(jnp.float32)

        # ------------- phases 0..NQ-1: rms(ln1) -> qkv row blocks -------
        for j in range(d.NQ):
            @pl.when(ph == d.PH_QKV0 + j)
            def _qkv(j=j):
                if j == 0:
                    hT_scr[:] = _rms_cols(xT_scr[:], ln_col(0), eps)  # (D, B)
                qkvT_scr[j * d.BQ3 : (j + 1) * d.BQ3] = wmm(
                    wqkvT_ref[0], hT_scr[:], sqkv_ref[0]
                ).astype(cdt)

        # ---------------- phase 1: self attention + cache update --------
        @pl.when(ph == d.PH_SELF)
        def _self():
            qkvT = qkvT_scr[:]
            lane_t = jax.lax.broadcasted_iota(jnp.int32, (I, d.Tmax), 1)
            out_cols = []
            for b in range(B):
                qb = _take_lane(qkvT[:I], b, cdt)  # (I, 1)
                kb = _take_lane(qkvT[I : 2 * I], b, cdt)
                vb = _take_lane(qkvT[2 * I :], b, cdt)
                sk_b = sk_ref[0, b * I : (b + 1) * I]  # (I, Tmax)
                sv_b = sv_ref[0, b * I : (b + 1) * I]
                sk_new = jnp.where(
                    lane_t == pos, jnp.broadcast_to(kb, (I, d.Tmax)).astype(sk_b.dtype), sk_b
                )
                sv_new = jnp.where(
                    lane_t == pos, jnp.broadcast_to(vb, (I, d.Tmax)).astype(sv_b.dtype), sv_b
                )
                sk_out_ref[0, b * I : (b + 1) * I] = sk_new
                sv_out_ref[0, b * I : (b + 1) * I] = sv_new
                scores = _scores_b(sk_new, qb, d) + sbias_ref[b]  # (H, Tmax) f32
                mx = jnp.max(scores, axis=-1, keepdims=True)
                p = jnp.exp(scores - mx)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                out_cols.append(_values_b(sv_new, p, d))  # (I, 1) f32
            outT_scr[:] = _put_lanes(out_cols, B)

        # ------- phases SO0..: self_o contraction blocks -> residual ----
        for j in range(d.NP):
            @pl.when(ph == d.PH_SO0 + j)
            def _self_o(j=j):
                out_blk = outT_scr[j * d.BI : (j + 1) * d.BI].astype(cdt)
                xT = xT_scr[:] + wmm(wsoT_ref[0], out_blk, sD_ref[0], 0)
                xT_scr[:] = xT
                if j == d.NP - 1:
                    hT_scr[:] = _rms_cols(xT, ln_col(1), eps)

        # ------- phases CQ0..: cross-query row blocks -------------------
        for j in range(d.NP):
            @pl.when(ph == d.PH_CQ0 + j)
            def _cross_q(j=j):
                qkvT_scr[j * d.BI : (j + 1) * d.BI] = wmm(
                    wcqT_ref[0], hT_scr[:], scq_ref[0]
                ).astype(cdt)
                if j == d.NP - 1:
                    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
                    l_scr[:] = jnp.zeros_like(l_scr)
                    acc_scr[:] = jnp.zeros_like(acc_scr)

        # ---------------- cross-attention phases x NC (flash) -----------
        @pl.when((ph >= d.PH_CROSS0) & (ph < d.PH_FIN0))
        def _cross():
            qT = qkvT_scr[:I]
            lane_h = jax.lax.broadcasted_iota(jnp.int32, (H, B), 1)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (I, B), 1)
            for b in range(B):
                cb = b // d.K  # beams share their batch row's cross cache
                qb = _take_lane(qT, b, cdt)  # (I, 1)
                scores = _scores_b(ck_ref[0, cb * I : (cb + 1) * I], qb, d)  # (H, BLK)
                if d.int8:
                    scores = scores * ks_ref[0, cb]
                scores = scores + jnp.broadcast_to(
                    _take_row(cbias_ref[:], cb), (H, d.blk_l)
                )
                m_prev = _take_lane(m_scr[:], b)  # (H, 1)
                m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)  # (H, 1)
                p = jnp.exp(scores - m_new)
                l_new = _take_lane(l_scr[:], b) * alpha + jnp.sum(
                    p, axis=-1, keepdims=True
                )
                m_scr[:] = jnp.where(
                    lane_h == b, jnp.broadcast_to(m_new, (H, B)), m_scr[:]
                )
                l_scr[:] = jnp.where(
                    lane_h == b, jnp.broadcast_to(l_new, (H, B)), l_scr[:]
                )
                if d.int8:
                    p = p * vs_ref[0, cb]
                alpha_i = jnp.broadcast_to(
                    alpha.reshape(H, 1, 1), (H, Dh, 1)
                ).reshape(I, 1)
                acc_new = _take_lane(acc_scr[:], b) * alpha_i + _values_b(
                    cv_ref[0, cb * I : (cb + 1) * I], p, d
                )
                acc_scr[:] = jnp.where(
                    lane_i == b, jnp.broadcast_to(acc_new, (I, B)), acc_scr[:]
                )

        # ------- phases FIN0..: finalize, cross_o blocks, rms(ln3) ------
        for j in range(d.NP):
            @pl.when(ph == d.PH_FIN0 + j)
            def _fin(j=j):
                if j == 0:
                    denom = jnp.maximum(l_scr[:], 1e-30)  # (H, B)
                    denom_i = jnp.broadcast_to(
                        denom.reshape(H, 1, B), (H, Dh, B)
                    ).reshape(I, B)
                    # outT_scr is free again (self_o consumed it)
                    outT_scr[:] = acc_scr[:] / denom_i  # (I, B) f32
                out_blk = outT_scr[j * d.BI : (j + 1) * d.BI].astype(cdt)
                xT = xT_scr[:] + wmm(wcoT_ref[0], out_blk, sD_ref[0], 1)
                xT_scr[:] = xT
                if j == d.NP - 1:
                    hT_scr[:] = _rms_cols(xT, ln_col(2), eps)

        # ---------------- phases 4+NC..: FFN blocks ---------------------
        @pl.when((ph >= d.PH_FFN0) & (ph < d.NPH))
        def _ffn():
            hT = hT_scr[:]
            aT = wmm(wiT_ref[0], hT, sF_ref[0], 0)  # (blk_f, B) f32
            if d.gated:
                a1T = wmm(wi1T_ref[0], hT, sF_ref[0], 1)
                aT = jax.nn.gelu(aT, approximate=True) * a1T
            else:
                aT = jnp.maximum(aT, 0.0)
            xT_scr[:] = xT_scr[:] + wmm(woT_ref[0], aT.astype(cdt), sD_ref[0], 2)

        # ---------------- epilogue: final rms + lm head blocks ----------
        @pl.when(s >= d.nL * d.NPH)
        def _lm():
            hT = _rms_cols(xT_scr[:], ln_col(3), eps)
            if d.tied:
                hT = hT * jnp.asarray(D**-0.5, cdt)
            logitsT_ref[:] = wmm(wlm_ref[:], hT, slm_ref[:])  # (blk_v, B) f32

    return kernel


# ---------------------------------------------------------------- entry point


def _index_maps(d: FusedDims):
    """Block index maps (flat step s, scalar ref) per operand. Operands not in
    play for a phase keep their previous index so the pipeline skips the
    re-fetch; tiny dummies park at 0."""
    NPH, NC = d.NPH, d.NC

    def layer(s):
        return jnp.minimum(s // NPH, d.nL - 1)

    def cross_blk(s):
        l, ph = _split_lp(s, d)
        return jnp.clip(ph - d.PH_CROSS0, 0, NC - 1)

    def ffn_blk(s):
        l, ph = _split_lp(s, d)
        return jnp.clip(ph - d.PH_FFN0, 0, d.NF - 1)

    def vocab_blk(s):
        return jnp.clip(s - d.nL * NPH, 0, d.NV - 1)

    def qkv_blk(s):
        l, ph = _split_lp(s, d)
        return jnp.clip(ph - d.PH_QKV0, 0, d.NQ - 1)

    def so_blk(s):
        l, ph = _split_lp(s, d)
        return jnp.clip(ph - d.PH_SO0, 0, d.NP - 1)

    def cq_blk(s):
        l, ph = _split_lp(s, d)
        return jnp.clip(ph - d.PH_CQ0, 0, d.NP - 1)

    def co_blk(s):
        l, ph = _split_lp(s, d)
        return jnp.clip(ph - d.PH_FIN0, 0, d.NP - 1)

    return {
        "full2d": lambda s, p: (0, 0),
        "full3d": lambda s, p: (0, 0, 0),
        "layer3d": lambda s, p: (layer(s), 0, 0),
        "layer4d": lambda s, p: (layer(s), 0, 0, 0),
        "ck": lambda s, p: (layer(s), 0, cross_blk(s)),
        "kscale": lambda s, p: (layer(s), 0, 0, cross_blk(s)),
        "cbias": lambda s, p: (0, cross_blk(s)),
        "wqkv": lambda s, p: (layer(s), qkv_blk(s), 0),
        "wso": lambda s, p: (layer(s), 0, so_blk(s)),
        "wcq": lambda s, p: (layer(s), cq_blk(s), 0),
        "wco": lambda s, p: (layer(s), 0, co_blk(s)),
        "wi": lambda s, p: (layer(s), ffn_blk(s), 0),
        "wo": lambda s, p: (layer(s), 0, ffn_blk(s)),
        "wlm": lambda s, p: (vocab_blk(s), 0),
        "logits": lambda s, p: (vocab_blk(s), 0),
    }


@functools.partial(jax.jit, static_argnames=("d", "interpret"))
def fused_decode_step(
    d: FusedDims,
    pos: jnp.ndarray,  # () int32
    xT: jnp.ndarray,  # (D, B) embedded input token columns, compute dtype
    weights: Dict[str, jnp.ndarray],
    cache: Dict[str, jnp.ndarray],
    sbias: jnp.ndarray,  # (B, H, Tmax) f32
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (logitsT (V, B) f32, new self_k_col, new self_v_col).

    weights (pre-transposed stacks, models/t5.py _build_fused_cache):
      wqkvT (nL,3I,D), lnsT (nL,D,8), self_oT/cross_oT (nL,D,I),
      cross_qT (nL,I,D), wiT/wi1T (nL,F,D), woT (nL,D,F), wlm (V,D).
      With d.int8w the matrix stacks are int8 plus f32 per-output-channel
      scale tables: sqkv (nL,3I,8), scq (nL,I,8), sD (nL,D,8; lanes
      self_o/cross_o/wo), sF (nL,F,8; lanes wi/wi_1), slm (V,8).
    cache: self_k_col/self_v_col (nL,B*I,Tmax) for the B QUERY rows;
      cross operands carry Bc = B/K rows (beams share a batch row's cross
      cache): cross_k_col/cross_v_col (nL,Bc*I,Lk), ks/vs (nL,Bc,H,Lk) f32
      (int8 only), cross_bias2d (Bc,Lk) f32.
    """
    im = _index_maps(d)
    B, Bc, D, I, H = d.B, d.Bc, d.D, d.I, d.H
    specs = [
        pl.BlockSpec((D, B), im["full2d"]),
        pl.BlockSpec((1, d.BQ3, D), im["wqkv"]),
        pl.BlockSpec((1, D, 8), im["layer3d"]),
        pl.BlockSpec((1, B * I, d.Tmax), im["layer3d"]),
        pl.BlockSpec((1, B * I, d.Tmax), im["layer3d"]),
        pl.BlockSpec((B, H, d.Tmax), im["full3d"]),
        pl.BlockSpec((1, D, d.BI), im["wso"]),
        pl.BlockSpec((1, d.BI, D), im["wcq"]),
        pl.BlockSpec((1, Bc * I, d.blk_l), im["ck"]),
        pl.BlockSpec((1, Bc * I, d.blk_l), im["ck"]),
        pl.BlockSpec((1, Bc, H, d.blk_l), im["kscale"]) if d.int8
        else pl.BlockSpec((1, 8, 128), im["full3d"]),
        pl.BlockSpec((1, Bc, H, d.blk_l), im["kscale"]) if d.int8
        else pl.BlockSpec((1, 8, 128), im["full3d"]),
        pl.BlockSpec((Bc, d.blk_l), im["cbias"]),
        pl.BlockSpec((1, D, d.BI), im["wco"]),
        pl.BlockSpec((1, d.blk_f, D), im["wi"]),
        pl.BlockSpec((1, d.blk_f, D), im["wi"]) if d.gated
        else pl.BlockSpec((1, 8, 128), im["full3d"]),
        pl.BlockSpec((1, D, d.blk_f), im["wo"]),
        pl.BlockSpec((d.blk_v, D), im["wlm"]),
    ]
    if d.int8w:
        specs += [
            pl.BlockSpec((1, d.BQ3, 8), im["wqkv"]),
            pl.BlockSpec((1, d.BI, 8), im["wcq"]),
            pl.BlockSpec((1, D, 8), im["layer3d"]),
            pl.BlockSpec((1, d.blk_f, 8), im["wi"]),
            pl.BlockSpec((d.blk_v, 8), im["wlm"]),
        ]
    else:
        specs += [pl.BlockSpec((1, 8, 128), im["full3d"])] * 4 + [
            pl.BlockSpec((8, 128), im["full2d"])
        ]
    dummy = jnp.zeros((1, 8, 128), jnp.float32)
    operands = [
        xT,
        weights["wqkvT"],
        weights["lnsT"],
        cache["self_k_col"],
        cache["self_v_col"],
        sbias,
        weights["self_oT"],
        weights["cross_qT"],
        cache["cross_k_col"],
        cache["cross_v_col"],
        cache.get("ks", dummy),
        cache.get("vs", dummy),
        cache["cross_bias2d"],
        weights["cross_oT"],
        weights["wiT"],
        weights.get("wi1T", dummy),
        weights["woT"],
        weights["wlm"],
    ]
    if d.int8w:
        operands += [weights["sqkv"], weights["scq"], weights["sD"],
                     weights["sF"], weights["slm"]]
    else:
        operands += [dummy] * 4 + [jnp.zeros((8, 128), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d.total_steps,),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((d.blk_v, B), im["logits"]),
            pl.BlockSpec((1, B * I, d.Tmax), im["layer3d"]),
            pl.BlockSpec((1, B * I, d.Tmax), im["layer3d"]),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, B), jnp.float32),  # xT
            pltpu.VMEM((3 * I, B), d.dtype),  # qkvT
            pltpu.VMEM((I, B), jnp.float32),  # outT
            pltpu.VMEM((H, B), jnp.float32),  # m (lane per query row)
            pltpu.VMEM((H, B), jnp.float32),  # l
            pltpu.VMEM((I, B), jnp.float32),  # acc
            pltpu.VMEM((D, B), d.dtype),  # hT (ffn input)
        ],
    )
    flops = 2 * B * (
        d.nL * (D * 3 * I + 2 * I * D + D * I + (2 + d.gated) * D * d.F)
        + D * d.V
    ) + 2 * B * H * d.nL * (d.Lk + d.Tmax) * d.Dh * 2
    nbytes = (
        sum(w.nbytes for w in weights.values())
        + cache["cross_k_col"].nbytes + cache["cross_v_col"].nbytes
        + (cache["ks"].nbytes + cache["vs"].nbytes if d.int8 else 0)
        + 2 * (cache["self_k_col"].nbytes + cache["self_v_col"].nbytes)
    )
    logitsT, sk, sv = pl.pallas_call(
        _make_kernel(d),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((d.V, B), jnp.float32),
            jax.ShapeDtypeStruct(cache["self_k_col"].shape, cache["self_k_col"].dtype),
            jax.ShapeDtypeStruct(cache["self_v_col"].shape, cache["self_v_col"].dtype),
        ],
        # operand indices include the scalar-prefetch arg: pos=0, xT=1, ...,
        # self caches are operands 4/5 -> outputs 1/2
        input_output_aliases={4: 1, 5: 2},
        interpret=jax.default_backend() != "tpu" if interpret is None else interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nbytes, transcendentals=B * H * d.Lk * d.nL
        ),
    )(jnp.asarray(pos, jnp.int32).reshape(1), *operands)
    return logitsT, sk, sv
