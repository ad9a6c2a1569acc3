"""Contriever-class dense retriever: BERT encoder + pooling, tied or untied towers.

Behavioral reference: /root/reference/src/retrievers.py — Contriever pooling :50-59
(masked mean / sqrt / cls, optional L2 norm), DualEncoderRetriever :90 (tied),
UntiedDualEncoderRetriever :108 with query-side-only finetuning (frozen passage tower
under no-grad :124-133 → here `jax.lax.stop_gradient`).

Params layout:
  tied:   {"contriever": bert_params}
  untied: {"query_contriever": bert_params, "passage_contriever": bert_params}
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from atlas_tpu.models.bert import BertConfig, bert_encode, init_bert

EMBEDDINGS_DIM = 768  # retrievers.py:13


def contriever_embed(
    params: Dict[str, Any],
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    pooling: str = "average",
    normalize: bool = False,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """-> (B, hidden) pooled embedding (retrievers.py:50-59)."""
    last_hidden = bert_encode(params, cfg, input_ids, attention_mask, deterministic=deterministic, rng=rng)
    mask = attention_mask.astype(bool)
    last_hidden = jnp.where(mask[..., None], last_hidden, 0.0)
    if pooling == "average":
        emb = last_hidden.sum(axis=1) / mask.sum(axis=1)[..., None]
    elif pooling == "sqrt":
        emb = last_hidden.sum(axis=1) / jnp.sqrt(mask.sum(axis=1)[..., None].astype(jnp.float32))
    elif pooling == "cls":
        emb = last_hidden[:, 0]
    else:
        raise ValueError(f"unknown pooling {pooling!r}")
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


def init_retriever(rng: jax.Array, cfg: BertConfig, untied: bool = False) -> Dict[str, Any]:
    bert = init_bert(rng, cfg)
    if untied:
        return {"query_contriever": bert, "passage_contriever": jax.tree.map(jnp.copy, bert)}
    return {"contriever": bert}


def untie_retriever(params: Dict[str, Any]) -> Dict[str, Any]:
    """Tied -> untied conversion (model_io.py:62-71 state-dict surgery equivalent)."""
    if "contriever" in params:
        return {
            "query_contriever": params["contriever"],
            "passage_contriever": jax.tree.map(jnp.copy, params["contriever"]),
        }
    return params


def retriever_embed(
    params: Dict[str, Any],
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    *,
    is_passages: bool,
    query_side_training: bool = False,
    pooling: str = "average",
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Dispatch to the right tower (retrievers.py:75-79, 120-135)."""
    if "contriever" in params:
        tower = params["contriever"]
    elif is_passages:
        tower = params["passage_contriever"]
        if query_side_training:
            # frozen passage encoder runs in eval mode: no grad AND no dropout
            # (retrievers.py:124-131 puts it under .eval() + no_grad)
            tower = jax.lax.stop_gradient(tower)
            deterministic, rng = True, None
    else:
        tower = params["query_contriever"]
    return contriever_embed(
        tower, cfg, input_ids, attention_mask, pooling=pooling,
        deterministic=deterministic, rng=rng,
    )
