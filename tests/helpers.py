"""Shared tiny-model fixtures for end-to-end tests."""

import numpy as np

import jax
import jax.numpy as jnp

from atlas_tpu.config import AtlasConfig
from atlas_tpu.core.atlas import Atlas
from atlas_tpu.models.bert import BertConfig
from atlas_tpu.models.contriever import init_retriever
from atlas_tpu.models.t5 import T5Config, init_t5
from atlas_tpu.tokenization import ByteTokenizer

TINY_VOCAB = 384  # ByteTokenizer vocab


def tiny_reader_cfg(**kw):
    d = dict(vocab_size=TINY_VOCAB, d_model=32, d_kv=8, d_ff=64, num_layers=2,
             num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
             relative_attention_max_distance=20, dropout_rate=0.0)
    d.update(kw)
    return T5Config(**d)


def tiny_retriever_cfg(**kw):
    d = dict(vocab_size=TINY_VOCAB, hidden_size=32, num_hidden_layers=2,
             num_attention_heads=4, intermediate_size=64, max_position_embeddings=512,
             hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    d.update(kw)
    return BertConfig(**d)


def tiny_atlas(cfg: AtlasConfig = None, untied=False, seed=0) -> Atlas:
    cfg = cfg or AtlasConfig(text_maxlength=32, target_maxlength=16, n_context=2,
                             retriever_n_context=2, precision="fp32")
    rcfg = tiny_reader_cfg()
    bcfg = tiny_retriever_cfg()
    return Atlas(
        cfg, rcfg, init_t5(jax.random.PRNGKey(seed), rcfg),
        bcfg, init_retriever(jax.random.PRNGKey(seed + 1), bcfg,
                             untied=untied or cfg.query_side_retriever_training),
        ByteTokenizer("t5"), ByteTokenizer("bert"),
    )


def tiny_passages(n):
    return [{"id": str(i), "title": f"title {i}", "text": f"this is passage number {i}"}
            for i in range(n)]
