"""Configuration system.

Dataclass-first equivalent of the reference's argparse flag system
(/root/reference/src/options.py:14-474): every reference flag has a field here with the
same name, default, and semantics, so reference launch commands translate 1:1. A thin
argparse bridge (`AtlasConfig.arg_parser` / `from_args`) generates CLI flags from the
dataclass fields, and `finalize()` applies the reference's post-parse rules
(closed_book overrides, paper-name score-mode aliases, use_file_passages implications;
options.py:449-466).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
from dataclasses import dataclass, field, fields
from pathlib import Path
from typing import List, Optional

logger = logging.getLogger(__name__)

READER_MODEL_CHOICES = [
    "t5-small",
    "t5-base",
    "t5-large",
    "t5-3b",
    "t5-11b",
    "google/t5-v1_1-base",
    "google/t5-v1_1-large",
    "google/t5-v1_1-xl",
    "google/t5-v1_1-xxl",
    "google/t5-base-lm-adapt",
    "google/t5-large-lm-adapt",
    "google/t5-xl-lm-adapt",
    "google/t5-xxl-lm-adapt",
]

GOLD_SCORE_MODES = ["evalnormsum", "loop", "ppmean", "emdr", "pdist", "adist"]
TASKS = ["base", "mlm", "lm", "multiple_choice", "kilt", "section", "fever", "qa"]
SCHEDULERS = ["linear", "cosine", "fixed"]
PRECISIONS = ["fp16", "fp32", "bf16"]
INDEX_MODES = ["flat", "faiss"]
FAISS_INDEX_TYPES = ["ivfflat", "flat", "ivfsq", "ivfpq", "pq", "sq8", "ivfsq8"]
PERMUTATION_TYPES = ["single", "cyclic", "all"]


@dataclass
class AtlasConfig:
    """All run options. Field groups mirror options.py's four argparse groups."""

    # --- basic parameters (options.py:19-95) ---
    name: str = "experiment_name"
    checkpoint_dir: str = "./checkpoint/"
    model_path: str = "none"
    per_gpu_batch_size: int = 1  # kept under the reference name; per-*device* batch size
    per_gpu_embedder_batch_size: int = 512
    local_rank: int = -1
    main_port: int = -1
    seed: int = 0
    log_freq: int = 100
    eval_freq: int = 500
    save_freq: int = 5000
    train_data: List[str] = field(default_factory=list)
    eval_data: List[str] = field(default_factory=list)
    write_results: bool = False
    dont_write_passages: bool = False

    # --- optim options (options.py:97-166) ---
    warmup_steps: int = 1000
    total_steps: int = 1000
    scheduler_steps: Optional[int] = None
    accumulation_steps: int = 1
    dropout: float = 0.1
    lr: float = 1e-4
    lr_retriever: float = 1e-5
    clip: float = 1.0
    scheduler: str = "cosine"
    weight_decay: float = 0.1
    save_optimizer: bool = False
    epsilon: float = 1e-6
    alpha: float = 1.0
    beta2: float = 0.999
    refresh_index: str = "-1"
    # 0 = blocking refresh (reference parity: train.py:65-73 stalls every rank
    # for the whole corpus pass). N > 0 spreads each refresh over ~N train steps
    # (a few embed slabs ride along with every step; index/refresh.py).
    refresh_overlap: int = 0
    shuffle: bool = False
    precision: str = "bf16"  # bf16 is native on TPU (reference default fp32)
    shard_optim: bool = False
    shard_grads: bool = False
    use_gradient_checkpoint_reader: bool = False
    use_gradient_checkpoint_retriever: bool = False

    # --- modeling options (options.py:168-395) ---
    reader_model_type: str = "google/t5-base-lm-adapt"
    # Local tokenizer directories overriding the tokenizer source while
    # reader_model_type keeps selecting the architecture — lets an offline box
    # pair real (`tokenizers`-built) HF fast tokenizers with any model size
    # (tools/mini_nq_canary.py; "" = derive from the model name as usual).
    reader_tokenizer_path: str = ""
    retriever_tokenizer_path: str = ""
    # Width of the --tiny_model debug towers (d_model / hidden_size; d_kv,
    # d_ff, intermediate scale with it). 32 suffices for plumbing tests; the
    # mini-NQ canary needs 64+ for the copy rule to be learnable at all.
    tiny_model_dim: int = 32
    text_maxlength: int = 200
    target_maxlength: Optional[int] = None
    n_context: int = 1
    passages: List[str] = field(default_factory=list)
    max_passages: int = -1
    retriever_model_path: str = "facebook/contriever"
    retrieve_only: bool = False
    train_retriever: bool = False
    use_file_passages: bool = False
    retriever_n_context: int = 5
    gold_score_mode: str = "ppmean"
    closed_book: bool = False
    temperature_score: float = 0.01
    temperature_gold: float = 0.01
    compute_crossattention_stats: bool = False
    filtering_overretrieve_ratio: int = 2
    freeze_retriever_steps: int = -1
    query_side_retriever_training: bool = False
    retrieve_with_rerank: bool = False
    n_to_rerank_with_retrieve_with_rerank: int = 128
    decoder_format: Optional[str] = None
    decoder_prompt_format: Optional[str] = None
    encoder_format: str = "{query} title: {title} context: {text}"
    retriever_format: str = "{title} {text}"
    generation_max_length: int = 128
    generation_min_length: Optional[int] = None
    generation_length_penalty: float = 1.0
    generation_num_beams: int = 1
    task: Optional[str] = None
    mlm_noise_density: float = 0.15
    mlm_mean_noise_span_length: float = 3
    min_words_per_lm_instance: Optional[int] = None
    min_lm_context_ratio: float = 0.5
    max_lm_context_ratio: float = 0.5
    qa_prompt_format: str = "question: {question} answer: <extra_id_0>"
    multiple_choice_num_options: int = 4
    multiple_choice_train_permutations: str = "single"
    multiple_choice_eval_permutations: str = "single"

    # --- index options (options.py:397-431) ---
    load_index_path: Optional[str] = None
    save_index_path: Optional[str] = None
    save_index_n_shards: int = 128
    index_mode: str = "flat"
    faiss_index_type: str = "flat"
    faiss_code_size: Optional[int] = None
    # IVF probe count: 0 = reference default (nprobe = nlist = ⌊√N⌋, index.py:212).
    # A smaller value engages the sparse posting-list kernel (ops/ivf_sparse.py),
    # whose cost scales with nprobe instead of the corpus size.
    ivf_nprobe: int = 0
    # Exact re-ranking of the top (k * factor) lossy-code candidates against the
    # resident embeddings (faiss IndexRefineFlat k_factor role — the reference
    # never wraps its IVFPQ in a refine; >1 recovers recall lost to PQ/SQ
    # rate-distortion at the cost of one candidate gather). -1 = auto: 4 for
    # the PQ-coded types (the r05 chip frontier measured refine-4 strictly
    # dominant on ivfpq — recall@100 0.677 -> 0.9892 at EVERY nprobe for 3-7%
    # QPS, tools/bench_ivfpq_frontier.py), off for near-exact codes
    # (sq8/ivfsq8/ivfflat/ivfsq). 0/1 forces it off (bare faiss parity).
    index_refine_factor: int = -1

    # --- TPU-native additions (no reference equivalent) ---
    # Device mesh: data-parallel axis x model-parallel axis. dp_size=-1 means
    # "all devices / mp_size". The passage index is always sharded over the full mesh.
    dp_size: int = -1
    mp_size: int = 1
    # Use the explicit Pallas fused MIPS kernel for the local index scan instead of
    # the XLA PartialReduce path (ops/pallas_mips.py; the XLA path measures faster
    # on v5e, so this is off by default).
    use_pallas: bool = False
    # Shrink models to toy dimensions (smoke tests / CI on CPU).
    tiny_model: bool = False
    # Per-chunk top-k selection recall for the flat MIPS scan: 1.0 = exact
    # (lax.top_k); <1.0 uses the TPU PartialReduce op (~8x faster at 0.99,
    # measured recall@100 vs exact: 0.998 on 1M x 768).
    search_recall_target: float = 0.99
    # jax.profiler trace capture: "start-end" step range (e.g. "10-12"), "" = off.
    # Traces land in {checkpoint_dir}/{name}/traces.
    profile_steps: str = ""
    # Attention implementation: "auto" = Pallas flash kernels on TPU for the hot
    # shapes (ops/flash.py), XLA fallback elsewhere; "flash" = force; "xla" = never.
    attn_impl: str = "auto"
    # Overlap next-batch query/target tokenization with the device step
    # (train/loop.py:_prefetch_pretokenized). --no-host_prefetch disables.
    host_prefetch: bool = True
    # Pad reader/retriever passage batches to a small ladder of length buckets
    # instead of always text_maxlength (core/atlas.py encode_passages_batch).
    # The reference pads "longest" per batch — free under torch, a recompile
    # per novel length under XLA; buckets bound the compiled shapes while
    # cutting encoder FLOPs roughly by the mean-passage/maxlength ratio.
    bucket_lengths: bool = False
    # Cross-attention KV-cache dtype for generation: "bf16" exact, "int8" halves
    # the per-token HBM traffic that floors FiD decode latency (models/t5.py).
    decode_kv_cache: str = "bf16"
    # Decode-step weight streaming via the Pallas kernels in ops/decode_matmul.py:
    # "auto" = the measured-winning subset on TPU (models/t5.py _AUTO_PARTS),
    # "on"/"off" = everything/nothing, or a comma-set of {lm,ffn,qkv,proj} to
    # stream just those matmuls (lm_head / fused FFN / fused qkv / o+cross-q).
    decode_stream: str = "auto"
    # Whole-decode-step fused Pallas kernel (ops/decode_fused.py): "auto" = on
    # for TPU greedy decoding when shapes allow, "on"/"off" force it.
    decode_fused: str = "auto"
    # Weight-only quantization for decoding: "int8" streams the decoder weight
    # stacks as int8 + per-output-channel scales (halves the weight HBM read
    # that bounds per-token latency on large readers; logits shift by the
    # quantization error). Applies to the fused kernel AND the XLA scan step
    # (beam / sharded decode); incompatible with decode_stream parts.
    decode_weights: str = "bf16"
    # Gradient-checkpoint recompute policy: "full" (lowest memory) or "dots"
    # (save matmul outputs, recompute elementwise — ~3% faster step on v5e).
    remat_policy: str = "full"
    # Checkpoint serialization: "npz" = single rank-0 npz per step dir (reference
    # parity, model_io.py:200-244); "orbax" = sharded tensorstore writes from every
    # process — required for models larger than host RAM.
    checkpoint_format: str = "npz"

    # --- runtime-derived fields (populated by the runtime, not flags) ---
    is_main: bool = True
    is_distributed: bool = False
    global_rank: int = 0
    world_size: int = 1

    def finalize(self) -> "AtlasConfig":
        """Post-parse mutual-exclusion rules (options.py:449-466)."""
        if self.precision == "fp16":
            # The reference pairs fp16 with a dynamic loss scaler
            # (/root/reference/train.py:49,96-116); this framework has no
            # scaler because TPU matmuls are natively bf16 — same memory as
            # fp16 with an fp32 exponent range, so scaling machinery buys
            # nothing. Accepting fp16 without a scaler would silently diverge
            # on real data; refuse it loudly instead.
            raise ValueError(
                "--precision fp16 is not supported: fp16 training needs a "
                "dynamic loss scaler and TPUs run bf16 natively at the same "
                "cost — use --precision bf16 (fp32 master weights are kept "
                "either way)")
        if self.closed_book:
            self.n_context = 1
            self.retriever_n_context = 1
            self.encoder_format = "{query}"
            self.use_file_passages = True
        if self.gold_score_mode == "pdist":
            self.gold_score_mode = "ppmean"
        if self.gold_score_mode == "adist":
            self.gold_score_mode = "evalnormsum"
        if self.use_file_passages:
            self.train_retriever = False
            self.query_side_retriever_training = False
            self.use_gradient_checkpoint_retriever = False
        return self

    # ------------------------------------------------------------------ argparse
    _CHOICES = {
        "scheduler": SCHEDULERS,
        "precision": PRECISIONS,
        "reader_model_type": READER_MODEL_CHOICES,
        "gold_score_mode": GOLD_SCORE_MODES,
        "task": TASKS,
        "index_mode": INDEX_MODES,
        "faiss_index_type": FAISS_INDEX_TYPES,
        "multiple_choice_train_permutations": PERMUTATION_TYPES,
        "multiple_choice_eval_permutations": PERMUTATION_TYPES,
        "attn_impl": ["auto", "flash", "xla"],
        "decode_kv_cache": ["bf16", "int8"],
        "decode_fused": ["auto", "on", "off"],
        "decode_weights": ["bf16", "int8"],
        "remat_policy": ["full", "dots"],
        "checkpoint_format": ["npz", "orbax"],
    }
    _RUNTIME_FIELDS = {"is_main", "is_distributed", "global_rank", "world_size"}

    @classmethod
    def arg_parser(cls) -> argparse.ArgumentParser:
        parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
        for f in fields(cls):
            if f.name in cls._RUNTIME_FIELDS:
                continue
            flag = f"--{f.name}"
            default = f.default if f.default is not dataclasses.MISSING else None
            if f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
                default = f.default_factory()  # type: ignore[misc]
            if f.type in ("bool", bool):
                # BooleanOptionalAction adds --flag / --no-flag, so a future field
                # defaulting True stays disableable from the CLI
                parser.add_argument(flag, action=argparse.BooleanOptionalAction,
                                    default=bool(default))
            elif f.type in ("List[str]", List[str]):
                parser.add_argument(flag, nargs="+", default=default)
            elif f.type in ("Optional[int]",):
                parser.add_argument(flag, type=int, default=default)
            elif f.type in ("Optional[float]",):
                parser.add_argument(flag, type=float, default=default)
            elif f.type in ("Optional[str]",):
                parser.add_argument(flag, type=str, default=default, choices=cls._CHOICES.get(f.name))
            elif f.type in ("int", int):
                parser.add_argument(flag, type=int, default=default)
            elif f.type in ("float", float):
                parser.add_argument(flag, type=float, default=default)
            else:
                parser.add_argument(flag, type=str, default=default, choices=cls._CHOICES.get(f.name))
        return parser

    @classmethod
    def from_args(cls, argv: Optional[List[str]] = None) -> "AtlasConfig":
        ns = cls.arg_parser().parse_args(argv)
        cfg = cls(**vars(ns))
        return cfg.finalize()

    def dump(self, path: Optional[str] = None) -> str:
        """Render options (marking non-defaults) like options.py:433-447."""
        default = AtlasConfig()
        lines = ["\n"]
        for f in sorted(fields(self), key=lambda f: f.name):
            v = getattr(self, f.name)
            dv = getattr(default, f.name)
            comment = f"\t(default: {dv})" if v != dv else ""
            lines.append(f"{f.name:>40}: {str(v):<40}{comment}")
        message = "\n".join(lines)
        if path is not None:
            Path(path).parent.mkdir(parents=True, exist_ok=True)
            Path(path).write_text(message + "\n")
        return message
