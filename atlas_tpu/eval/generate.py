"""Jitted autoregressive generation: greedy and beam search with a KV cache.

Replaces the reference's HF `generate()` call (/root/reference/src/atlas.py:592-636):
beam search with length penalty, min/max length, and decoder-prompt forcing (the only
use of prefix_allowed_tokens_fn) — implemented as lax.while_loop decode loops over the
incremental t5_decode_step, so the whole decode compiles once per shape. Sequences
include the leading decoder_start token and count toward max_length, matching HF.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from atlas_tpu.models.fid import fid_encode
from atlas_tpu.models.t5 import T5Config, init_decode_cache, t5_decode_step

NEG = -1.0e7

# Ablation surfaces (tools/bench_beam_topk.py): trace-time switches back to
# the single flat (B, K*V) top-2K and the unconditional cache permute the beam
# step used before. Not runtime knobs — flip + _clear_cache() to re-trace.
_FLAT_TOPK = False
_ALWAYS_PERMUTE = False


@partial(jax.jit, static_argnames=("cfg", "max_length", "min_length", "has_prefix"))
def greedy_generate(
    params,
    cfg: T5Config,
    input_ids: jnp.ndarray,  # (B, N, L)
    attention_mask: jnp.ndarray,
    max_length: int,
    min_length: int = 0,
    forced_prefix: Optional[jnp.ndarray] = None,  # (B, P) token ids to force
    prefix_len: Optional[jnp.ndarray] = None,  # (B,) lengths
    has_prefix: bool = False,
) -> jnp.ndarray:
    """-> (B, max_length) sequences: [decoder_start, tok1, ..., eos, pad...]."""
    B, N, L = input_ids.shape
    enc = fid_encode(params, cfg, input_ids, attention_mask, deterministic=True)
    enc_mask = attention_mask.reshape(B, N * L)
    cache = init_decode_cache(params, cfg, enc, enc_mask, max_length)

    out = jnp.zeros((B, max_length), dtype=jnp.int32)
    out = out.at[:, 0].set(cfg.decoder_start_token_id)
    state = (
        jnp.int32(0),  # position of the token being fed
        jnp.full((B,), cfg.decoder_start_token_id, dtype=jnp.int32),
        jnp.zeros((B,), dtype=bool),
        out,
        cache,
    )

    def cond(state):
        t, _, finished, _, _ = state
        return (t < max_length - 1) & ~jnp.all(finished)

    def body(state):
        t, tokens, finished, out, cache = state
        logits, cache = t5_decode_step(params, cfg, tokens, t, cache)
        logits = logits.astype(jnp.float32)
        if min_length > 0:
            logits = jnp.where((t + 1 < min_length) & (jnp.arange(logits.shape[-1]) == 1)[None, :],
                               NEG, logits)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if has_prefix:
            nxt = jnp.where(t < prefix_len, forced_prefix[:, jnp.minimum(t, forced_prefix.shape[1] - 1)], nxt)
        nxt = jnp.where(finished, cfg.pad_token_id, nxt)
        out = out.at[:, t + 1].set(nxt)
        finished = finished | (nxt == 1)  # eos
        return (t + 1, nxt, finished, out, cache)

    _, _, _, out, _ = jax.lax.while_loop(cond, body, state)
    return out


@partial(
    jax.jit,
    static_argnames=("cfg", "max_length", "min_length", "num_beams", "length_penalty",
                     "has_prefix"),
)
def beam_generate(
    params,
    cfg: T5Config,
    input_ids: jnp.ndarray,  # (B, N, L)
    attention_mask: jnp.ndarray,
    max_length: int,
    num_beams: int,
    min_length: int = 0,
    length_penalty: float = 1.0,
    forced_prefix: Optional[jnp.ndarray] = None,  # (B, P) decoder-prompt forcing
    prefix_len: Optional[jnp.ndarray] = None,  # (B,)
    has_prefix: bool = False,
) -> jnp.ndarray:
    """HF-semantics beam search (early_stopping=False): length penalty
    sum_logprobs / len**penalty applied when a hypothesis finishes; search stops when
    the best running score cannot beat the worst finished one. -> (B, max_length)."""
    B, N, L = input_ids.shape
    K = num_beams
    enc = fid_encode(params, cfg, input_ids, attention_mask, deterministic=True)
    # cross K/V stay ONE copy per batch row; only the self cache carries beams
    cache = init_decode_cache(params, cfg, enc, attention_mask.reshape(B, N * L),
                              max_length, self_batch=B * K)
    V = params["shared"].shape[0]

    alive_seq = jnp.zeros((B, K, max_length), dtype=jnp.int32)
    alive_seq = alive_seq.at[:, :, 0].set(cfg.decoder_start_token_id)
    # only beam 0 is live initially (HF: first step expands one beam)
    alive_logp = jnp.tile(jnp.array([0.0] + [NEG] * (K - 1)), (B, 1))
    fin_seq = jnp.zeros((B, K, max_length), dtype=jnp.int32)
    fin_scores = jnp.full((B, K), NEG)
    fin_flags = jnp.zeros((B, K), dtype=bool)

    def gather_beams(x, idx):
        # x (B, K, ...) idx (B, K') -> (B, K', ...)
        return jax.vmap(lambda xb, ib: xb[ib])(x, idx)

    def gather_cache(cache, idx):
        # Only the SELF cache is beam-dependent; cross K/V and bias are identical
        # across beams of a batch row (the beam permutation is within-row), so
        # re-gathering them would copy gigabytes per step for nothing. The
        # permute itself is skipped via lax.cond on identity steps (once beams
        # settle, survivors usually extend their own beam): ~75MB of cache
        # read+write per skipped step at the t5-base serving point.
        flat_idx = (idx + jnp.arange(B)[:, None] * K).reshape(-1)  # (B*K,)
        is_identity = jnp.all(flat_idx == jnp.arange(B * K))

        def permute(cache):
            if "self_k_col" in cache:
                # fused-kernel layout (nL, B*K*I, Tmax): permute per-row I-groups
                def perm(x):
                    nL, R, T = x.shape
                    return x.reshape(nL, B * K, R // (B * K), T)[:, flat_idx].reshape(
                        nL, R, T
                    )

                return dict(cache, self_k_col=perm(cache["self_k_col"]),
                            self_v_col=perm(cache["self_v_col"]))
            return dict(
                cache,
                self_k=cache["self_k"][:, flat_idx],
                self_v=cache["self_v"][:, flat_idx],
            )

        if _ALWAYS_PERMUTE:
            return permute(cache)
        return jax.lax.cond(is_identity, lambda c: c, permute, cache)

    def cond(state):
        t, alive_logp, fin_scores, fin_flags, *_ = state
        # HF early_stopping=False heuristic (BeamHypotheses.is_done): the bound
        # divides by the CURRENT length for every penalty sign — deliberately
        # inexact for length_penalty > 0 (can stop before a longer hypothesis
        # would win) but it is what generate() ships, so parity keeps it
        best_alive = alive_logp.max(axis=1) / (t + 1).astype(jnp.float32) ** length_penalty
        worst_fin = jnp.where(fin_flags, fin_scores, NEG).min(axis=1)
        all_done = jnp.all(fin_flags, axis=1) & (worst_fin >= best_alive)
        return (t < max_length - 1) & ~jnp.all(all_done)

    def body(state):
        t, alive_logp, fin_scores, fin_flags, alive_seq, fin_seq, cache = state
        tokens = jax.lax.dynamic_slice_in_dim(alive_seq, t, 1, axis=2).reshape(B * K)
        logits, cache = t5_decode_step(params, cfg, tokens, t, cache, beam_size=K)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(B, K, V)
        if min_length > 0:
            logp = jnp.where((t + 1 < min_length) & (jnp.arange(V) == 1)[None, None, :], NEG, logp)
        if has_prefix:
            # decoder-prompt forcing (prefix_allowed_tokens_fn role, atlas.py:602-636):
            # while t < prefix_len[b], only the forced token is allowed
            forced_tok = forced_prefix[:, jnp.minimum(t, forced_prefix.shape[1] - 1)]  # (B,)
            in_prefix = (t < prefix_len)[:, None, None]  # (B,1,1)
            allowed = (jnp.arange(V)[None, None, :] == forced_tok[:, None, None])
            logp = jnp.where(in_prefix & ~allowed, NEG, logp)
        cand = alive_logp[:, :, None] + logp  # (B, K, V)
        if _FLAT_TOPK:
            flat = cand.reshape(B, K * V)
            top_vals, top_idx = jax.lax.top_k(flat, 2 * K)  # (B, 2K)
            beam_idx = top_idx // V
            tok_idx = (top_idx % V).astype(jnp.int32)
        else:
            # two-stage exact top-2K: any global top-2K candidate from beam k is
            # in beam k's own top-2K, so a per-beam top-2K (narrow V-axis sorts)
            # + a (B, 2K*K) merge selects the same set as top_k over the flat
            # (B, K*V) axis — no 128K-wide partial sort per step. Merge keys are
            # (value, beam-major position), matching flat-index tie order for
            # distinct values.
            vals_b, toks_b = jax.lax.top_k(cand, 2 * K)  # (B, K, 2K)
            top_vals, merge_idx = jax.lax.top_k(vals_b.reshape(B, K * 2 * K), 2 * K)
            beam_idx = merge_idx // (2 * K)
            tok_idx = jnp.take_along_axis(
                toks_b.reshape(B, K * 2 * K), merge_idx, axis=1).astype(jnp.int32)
        seqs = gather_beams(alive_seq, beam_idx)  # (B, 2K, maxlen)
        seqs = seqs.at[:, :, t + 1].set(tok_idx)
        # masked-out candidates (min_length / forced prefix) carry ~NEG scores and
        # must never enter the finished pool
        is_eos = (tok_idx == 1) & (top_vals > NEG / 2)
        # HF SKIPS an eos candidate ranked outside the top num_beams
        # ("is_beam_token_worse_than_top_num_beams" in BeamSearchScorer.process):
        # it neither enters the finished pool nor survives as alive; replicate
        # both or the pools diverge from generate()
        finishes = is_eos & (jnp.arange(2 * K) < K)[None, :]

        # finished candidates: apply length penalty over generated length (t+1 tokens)
        hyp_len = (t + 1).astype(jnp.float32)
        fin_cand_scores = jnp.where(finishes, top_vals / hyp_len**length_penalty, NEG)
        all_fin_scores = jnp.concatenate([fin_scores, fin_cand_scores], axis=1)  # (B, 3K)
        all_fin_seqs = jnp.concatenate([fin_seq, seqs], axis=1)
        all_fin_flags = jnp.concatenate([fin_flags, finishes], axis=1)
        new_fin_scores, fin_top = jax.lax.top_k(all_fin_scores, K)
        new_fin_seqs = gather_beams(all_fin_seqs, fin_top)
        new_fin_flags = gather_beams(all_fin_flags, fin_top)

        # alive: best K non-eos continuations
        alive_cand = jnp.where(is_eos, NEG, top_vals)
        new_alive_logp, alive_top = jax.lax.top_k(alive_cand, K)
        new_alive_seq = gather_beams(seqs, alive_top)
        new_beam_src = gather_beams(beam_idx[..., None], alive_top)[..., 0]  # (B, K)
        cache = gather_cache(cache, new_beam_src)
        return (t + 1, new_alive_logp, new_fin_scores, new_fin_flags,
                new_alive_seq, new_fin_seqs, cache)

    state = (jnp.int32(0), alive_logp, fin_scores, fin_flags, alive_seq, fin_seq, cache)
    t, alive_logp, fin_scores, fin_flags, alive_seq, fin_seq, _ = jax.lax.while_loop(cond, body, state)

    # finalize like HF: unfinished alive hypotheses join the pool with their
    # length-penalized running scores; best overall wins
    alive_final = alive_logp / jnp.maximum(t.astype(jnp.float32), 1.0) ** length_penalty
    fin_final = jnp.where(fin_flags, fin_scores, NEG)
    best_fin = jnp.argmax(fin_final, axis=1)
    best_alive = jnp.argmax(alive_final, axis=1)
    fin_best_score = jnp.take_along_axis(fin_final, best_fin[:, None], 1)[:, 0]
    alive_best_score = jnp.take_along_axis(alive_final, best_alive[:, None], 1)[:, 0]
    pick_fin = gather_beams(fin_seq, best_fin[:, None])[:, 0]
    pick_alive = gather_beams(alive_seq, best_alive[:, None])[:, 0]
    return jnp.where((fin_best_score >= alive_best_score)[:, None], pick_fin, pick_alive)
