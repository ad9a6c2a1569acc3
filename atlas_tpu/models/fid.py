"""Fusion-in-Decoder reader on top of the JAX T5.

Behavioral reference: /root/reference/src/fid.py. The FiD trick (fid.py:47-77): the
encoder treats each of the n_context (query+passage) concatenations as an independent
sequence — (B, N, L) -> (B*N, L) — and the decoder cross-attends over the fan-in
(B, N*L, d) of all encoder outputs. On TPU the fan-out is a pure reshape feeding one
big batched encoder call (ideal MXU shape); no per-passage loop exists anywhere.

Cross-attention score capture for retriever distillation is functional: t5_decode
returns per-layer head-averaged (scores, probs, norms) as scan ys (vs the reference's
monkey-patched forward + module storage, fid.py:221-357), and the aggregation below
reproduces FiD.get_crossattention_scores / aggregate_value (fid.py:137-219).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from atlas_tpu.models.t5 import T5Config, cross_entropy, t5_decode, t5_encode

# fid.py:174,217 normalize "sum"-family aggregations by a fixed 256-token budget
# instead of the true passage length; kept for score parity.
NTOKENS_BUDGET = 256
SEP_TOKEN_ID = 1  # </s> in the T5 vocab (fid.py:187 `ids == 1`)


def fid_encode(
    params, cfg: T5Config, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
    deterministic: bool = True, rng=None,
) -> jnp.ndarray:
    """(B, N, L) passages -> (B, N*L, d) fused encoder states (fid.py:47-49,66-77)."""
    B, N, L = input_ids.shape
    enc = t5_encode(
        params, cfg, input_ids.reshape(B * N, L), attention_mask.reshape(B * N, L),
        deterministic=deterministic, rng=rng,
    )
    return enc.reshape(B, N * L, -1)


def fid_forward(
    params,
    cfg: T5Config,
    input_ids: jnp.ndarray,  # (B, N, L)
    attention_mask: jnp.ndarray,  # (B, N, L)
    decoder_input_ids: jnp.ndarray,  # (B, T)
    labels: Optional[jnp.ndarray] = None,  # (B, T)
    deterministic: bool = True,
    rng=None,
    capture_cross_attn: bool = False,
    encoder_hidden: Optional[jnp.ndarray] = None,  # reuse cached fan-in (loop_score)
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """-> (loss, logits, cross_attn_stats). Loss is mean token CE over labels != -100."""
    B, N, L = input_ids.shape
    r1 = r2 = None
    if rng is not None:
        import jax

        r1, r2 = jax.random.split(rng)
    if encoder_hidden is None:
        encoder_hidden = fid_encode(params, cfg, input_ids, attention_mask, deterministic, r1)
    logits, stats = t5_decode(
        params, cfg, decoder_input_ids, encoder_hidden,
        attention_mask.reshape(B, N * L),
        deterministic=deterministic, rng=r2, capture_cross_attn=capture_cross_attn,
    )
    loss = cross_entropy(logits, labels) if labels is not None else None
    return loss, logits, stats


# ------------------------------------------------------- cross-attention aggregation


def aggregate_cross_attention(
    layer_scores: jnp.ndarray,  # (n_layers, B, T, N*L) head-averaged
    mask: jnp.ndarray,  # (B, N, L) bool passage-token mask
    labels: jnp.ndarray,  # (B, T) with -100 padding
    ids: jnp.ndarray,  # (B, N, L) reader token ids
    prefix: str,
    mask_query: Optional[jnp.ndarray] = None,  # (B, Lq) query-token mask
    output: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """One prefix's aggregations -> dict of (B, N) per-passage scalars (fid.py:166-199)."""
    if output is None:
        output = {}
    n_layers, B, T, _ = layer_scores.shape
    N, L = mask.shape[1], mask.shape[2]
    scores = layer_scores.reshape(n_layers, B, T, N, L)
    maskb = mask.astype(bool)
    scores = jnp.where(maskb[None, :, None], scores, 0.0)

    label_valid = (labels != -100).sum(axis=1)[:, None]  # (B, 1)
    ntokens_sum = NTOKENS_BUDGET * n_layers * label_valid
    ntokens_wquery = maskb.sum(axis=2) * n_layers * label_valid
    ntokens_first = maskb.sum(axis=2) * n_layers

    scores = scores.sum(axis=0)  # (B, T, N, L) — layer sum

    # top-k over passage tokens (fid.py:201-206)
    for k in (5, 10, 20):
        kk = min(k, L)
        topk = jnp.sort(scores, axis=-1)[..., -kk:].sum(axis=-1)  # (B, T, N)
        topk = jnp.where((labels == -100)[:, :, None], 0.0, topk)
        ntokens_top = n_layers * label_valid
        output[f"{prefix}top{k}"] = topk.sum(axis=1) / (kk * ntokens_top)

    scores = jnp.where((labels == -100)[:, :, None, None], 0.0, scores)
    scores_wquery = scores.sum(axis=(1, 3))  # (B, N)

    sep_only = jnp.where((ids == SEP_TOKEN_ID)[:, None], scores, 0.0)
    output[f"{prefix}nosep"] = sep_only.sum(axis=(1, 3)) / ntokens_sum

    output[f"{prefix}first"] = scores[:, 0].sum(axis=2) / ntokens_first
    output[f"{prefix}sum"] = scores_wquery / ntokens_sum
    output[f"{prefix}avg"] = scores_wquery / ntokens_wquery

    if mask_query is not None:
        # fid.py:208-219: zero out query tokens (query sits at the head of each passage seq)
        mq = mask_query.astype(bool)
        if mq.shape[-1] < L:
            mq = jnp.pad(mq, ((0, 0), (0, L - mq.shape[-1])))
        else:
            mq = mq[:, :L]
        keep = maskb & ~mq[:, None]
        woq = jnp.where(keep[:, None], scores, 0.0)
        output[f"{prefix}woquery"] = woq.sum(axis=(1, 3)) / ntokens_sum
    return output


def get_crossattention_scores(
    stats: Dict[str, jnp.ndarray],  # {"scores","probs","norms"} from t5_decode capture
    mask: jnp.ndarray,
    labels: jnp.ndarray,
    ids: jnp.ndarray,
    mode: str = "all",
    mask_query: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """fid.py:137-164: aggregate each captured storage whose prefix appears in mode."""
    output: Dict[str, jnp.ndarray] = {}
    for prefix in ("scores", "probs", "norms"):
        if prefix in mode or "all" in mode:
            aggregate_cross_attention(
                stats[prefix], mask, labels, ids, prefix, mask_query=mask_query, output=output
            )
    return output


def select_crossattention_scores(scores: Dict[str, jnp.ndarray], mode: str) -> jnp.ndarray:
    """atlas.py:639-643. "evalnormsum" -> key "normssum" (the reference's string slice
    yields "normsum", a key that does not exist — we canonicalize to the produced key)."""
    if mode.startswith("eval"):
        key = mode[len("eval"):]
    elif mode.startswith("std"):
        key = mode[len("std"):]
    else:
        raise ValueError(f"not a crossattention score mode: {mode}")
    if key not in scores and f"norms{key[len('norm'):]}" in scores:
        key = f"norms{key[len('norm'):]}"
    return scores[key]
