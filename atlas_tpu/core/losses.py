"""Retriever-distillation gold scores and losses, as pure jittable functions.

Behavioral reference: /root/reference/src/atlas.py —
  perplexity_score :282-308 (ppmean), eval_score :310-337 (evalnormsum family),
  loop_score :339-379, emdr_score :381-397, kldivloss :552-555, logprob :557-575.

The reference runs these as separate no-grad module calls with monkey-patched
attention storage; here each is a pure function over (reader_params, arrays) that the
caller composes (under stop_gradient) into ONE jitted loss — XLA fuses the shared
encoder work and the n_context fan-outs stay batched MXU matmuls. The leave-one-out
mode vmaps the decoder over the n_context masks instead of a python loop.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from atlas_tpu.models.fid import (
    fid_encode,
    fid_forward,
    get_crossattention_scores,
    select_crossattention_scores,
)
from atlas_tpu.models.t5 import T5Config, cross_entropy, t5_decode

IGNORE_INDEX = -100


def perplexity_score(
    reader_params, reader_cfg: T5Config,
    reader_ids: jnp.ndarray,  # (B, N, L)
    reader_mask: jnp.ndarray,
    decoder_input_ids: jnp.ndarray,  # (B, T)
    labels: jnp.ndarray,  # (B, T)
) -> jnp.ndarray:
    """ppmean (atlas.py:282-308): -mean token NLL of the target given each passage
    alone -> (B, N)."""
    B, N, L = reader_ids.shape
    T = labels.shape[1]
    ids = reader_ids.reshape(B * N, 1, L)
    mask = reader_mask.reshape(B * N, 1, L)
    dec = jnp.repeat(decoder_input_ids, N, axis=0)
    lab = jnp.repeat(labels, N, axis=0)
    _, logits, _ = fid_forward(reader_params, reader_cfg, ids, mask, dec, deterministic=True)
    token_nll = cross_entropy(logits, lab, reduction="none").reshape(B, N, T)
    z = (lab.reshape(B, N, T) > -1).sum(axis=-1)
    return -token_nll.sum(axis=-1) / z


def emdr_score(
    reader_params, reader_cfg: T5Config,
    reader_ids: jnp.ndarray,  # (B, N, L)
    reader_mask: jnp.ndarray,
    decoder_input_ids: jnp.ndarray,
    labels: jnp.ndarray,
) -> jnp.ndarray:
    """emdr (atlas.py:381-397): per-passage reader logits (B*N, T, V)."""
    B, N, L = reader_ids.shape
    ids = reader_ids.reshape(B * N, 1, L)
    mask = reader_mask.reshape(B * N, 1, L)
    dec = jnp.repeat(decoder_input_ids, N, axis=0)
    _, logits, _ = fid_forward(reader_params, reader_cfg, ids, mask, dec, deterministic=True)
    return logits  # (B*N, T, V)


def loop_score(
    reader_params, reader_cfg: T5Config,
    reader_ids: jnp.ndarray,  # (B, N, L)
    reader_mask: jnp.ndarray,
    decoder_input_ids: jnp.ndarray,
    labels: jnp.ndarray,
) -> jnp.ndarray:
    """loop (atlas.py:339-379): leave-one-out perplexity. Encoder runs ONCE; the N
    decoder passes (one passage masked out each) are vmapped -> (B, N)."""
    B, N, L = reader_ids.shape
    enc = fid_encode(reader_params, reader_cfg, reader_ids, reader_mask, deterministic=True)

    def one(loo_index):
        m = reader_mask.at[:, loo_index].set(0).reshape(B, N * L)
        logits, _ = t5_decode(reader_params, reader_cfg, decoder_input_ids, enc, m, deterministic=True)
        nll = cross_entropy(logits, labels, reduction="none")  # (B, T)
        return nll.sum(axis=-1) / (labels > -1).sum(axis=-1)

    return jax.vmap(one, out_axes=1)(jnp.arange(N))  # (B, N)


def eval_score(
    reader_params, reader_cfg: T5Config,
    reader_ids: jnp.ndarray,  # (B, N, L)
    reader_mask: jnp.ndarray,
    decoder_input_ids: jnp.ndarray,
    labels: jnp.ndarray,
    gold_score_mode: str,
    mask_query: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """evalnormsum family (atlas.py:310-337): full FiD forward with cross-attention
    capture, aggregated per passage."""
    dec = decoder_input_ids
    _, _, stats = fid_forward(
        reader_params, reader_cfg, reader_ids, reader_mask, dec,
        deterministic=True, capture_cross_attn=True,
    )
    agg = get_crossattention_scores(
        stats, reader_mask, labels, reader_ids, mode=gold_score_mode, mask_query=mask_query
    )
    return select_crossattention_scores(agg, gold_score_mode)


def kldivloss(score: jnp.ndarray, gold_score: jnp.ndarray, temp_score: float, temp_gold: float) -> jnp.ndarray:
    """atlas.py:552-555. torch KLDivLoss() default 'mean' divides by ALL elements."""
    gold = jax.nn.softmax(gold_score.astype(jnp.float32) / temp_gold, axis=-1)
    logp = jax.nn.log_softmax(score.astype(jnp.float32) / temp_score, axis=-1)
    kl = gold * (jnp.log(jnp.maximum(gold, 1e-30)) - logp)
    return kl.mean()


def emdr_logprob(
    score: jnp.ndarray,  # (B, N) retriever scores
    gold_logits: jnp.ndarray,  # (B*N, T, V) from emdr_score
    labels: jnp.ndarray,  # (B, T)
    temp_score: float,
    temp_gold: float,
) -> jnp.ndarray:
    """EMDR2 objective (atlas.py:557-575)."""
    B, N = score.shape
    T = labels.shape[1]
    rep = jnp.repeat(labels, N, axis=0)
    rep = jnp.where(rep == IGNORE_INDEX, 0, rep)
    mask_labels = labels >= 0  # (B, T)
    gold_log_prob = jax.nn.log_softmax(gold_logits.astype(jnp.float32) / temp_gold, axis=-1)
    gold_log_probs = jnp.take_along_axis(gold_log_prob, rep[..., None], axis=-1).squeeze(-1)
    gold_log_probs = gold_log_probs.reshape(B, N, T)
    log_score = jax.nn.log_softmax(score.astype(jnp.float32) / temp_score, axis=-1)  # (B, N)
    log_prob = gold_log_probs + log_score[..., None]
    logsumprobs = jax.nn.logsumexp(log_prob, axis=1)  # (B, T)
    return -jnp.sum(logsumprobs * mask_labels) / jnp.sum(mask_labels)


def gold_score(
    mode: str,
    reader_params, reader_cfg: T5Config,
    reader_ids, reader_mask, decoder_input_ids, labels,
    mask_query=None,
):
    """Dispatch (atlas.py:470-479); all modes run under stop_gradient at the caller."""
    if "eval" in mode:
        return eval_score(reader_params, reader_cfg, reader_ids, reader_mask,
                          decoder_input_ids, labels, mode, mask_query)
    if "loop" in mode:
        return loop_score(reader_params, reader_cfg, reader_ids, reader_mask,
                          decoder_input_ids, labels)
    if "ppmean" in mode:
        return perplexity_score(reader_params, reader_cfg, reader_ids, reader_mask,
                                decoder_input_ids, labels)
    if "emdr" in mode:
        return emdr_score(reader_params, reader_cfg, reader_ids, reader_mask,
                          decoder_input_ids, labels)
    raise ValueError(f"unknown gold_score_mode {mode!r}")
