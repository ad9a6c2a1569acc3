"""atlas_tpu — a TPU-native (JAX / XLA / Pallas / pjit) retrieval-augmented LM framework.

Capability parity target: facebookresearch/atlas (see SURVEY.md). The framework provides:

- A Contriever-class dense retriever (BERT dual encoder) and a Fusion-in-Decoder T5
  reader, written as pure-functional JAX models sharded with GSPMD over a device mesh.
- A device-resident, mesh-sharded passage index with exact MIPS (fused Pallas
  scan+top-k) and approximate modes (PQ / IVF-Flat / IVF-PQ / IVF-SQ code scans).
- Retrieval-in-the-training-loop joint training with scheduled in-place index refresh,
  over-retrieve + rerank, query-side finetuning, and four retriever-distillation
  gold-score modes (ppmean / evalnormsum family / loop / emdr).
- Task framework (base, mlm, lm, qa, multiple_choice, fever, kilt, section), metrics,
  jitted greedy/beam generation, sharded checkpointing with resume.
"""

__version__ = "0.1.0"

EMBEDDINGS_DIM: int = 768
IGNORE_INDEX: int = -100
BERT_MAX_SEQ_LENGTH: int = 512
