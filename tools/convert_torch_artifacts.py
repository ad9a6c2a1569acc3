#!/usr/bin/env python
"""Convert released torch Atlas artifacts to the atlas_tpu formats.

Two interop paths (SURVEY.md §7 hard part #7):

1. checkpoint: the released `model.pth.tar` (torch state dict with `reader.` /
   `retriever.` prefixes, /root/reference/src/model_io.py:227-241) -> an atlas_tpu
   checkpoint dir (state.npz + meta.json) loadable via --model_path.
2. index: the released 128-shard torch index (`embeddings.{i}.pt` (768, n) fp16 +
   pickled `passages.{i}.pt`, /root/reference/src/index.py:61-87) -> our
   embeddings.{i}.npy (n, 768) + passages.{i}.jsonl + index_meta.json, loadable via
   --load_index_path.

Usage:
  python tools/convert_torch_artifacts.py checkpoint --src model.pth.tar \
      --dest ckpt_dir --reader_model_type google/t5-large-lm-adapt
  python tools/convert_torch_artifacts.py index --src index_dir --dest out_dir \
      --n_shards 128
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def convert_checkpoint(src: str, dest: str, reader_model_type: str, query_side: bool,
                       reader_cfg=None, retr_cfg=None) -> None:
    import dataclasses

    import torch

    from atlas_tpu.config import AtlasConfig
    from atlas_tpu.model_io import tree_to_flat
    from atlas_tpu.models.bert import bert_config_for
    from atlas_tpu.models.contriever import untie_retriever
    from atlas_tpu.models.hf_import import bert_params_from_state_dict, t5_params_from_state_dict
    from atlas_tpu.models.t5 import t5_config_for

    ckpt = torch.load(src, map_location="cpu")
    sd = {k.replace("retriever.module", "retriever").replace("reader.module", "reader"): v
          for k, v in ckpt["model"].items()}

    def _n_layers(prefix):
        n = 0
        while f"{prefix}.block.{n}.layer.0.SelfAttention.q.weight" in sd:
            n += 1
        return n

    if reader_cfg is None:
        reader_cfg = t5_config_for(reader_model_type)
        nl = _n_layers("reader.encoder")
        if nl and nl != reader_cfg.num_layers:  # trust the checkpoint's depth
            reader_cfg = dataclasses.replace(reader_cfg, num_layers=nl,
                                             num_decoder_layers=_n_layers("reader.decoder"))
    reader = t5_params_from_state_dict(sd, reader_cfg, prefix="reader.")

    if retr_cfg is None:
        retr_cfg = bert_config_for("bert-base-uncased")
    retr = None
    if any(k.startswith("retriever.contriever") for k in sd):
        retr = {"contriever": bert_params_from_state_dict(sd, retr_cfg, prefix="retriever.contriever.")}
        if query_side:
            retr = untie_retriever(retr)
    elif any(k.startswith("retriever.query_contriever") for k in sd):
        retr = {
            "query_contriever": bert_params_from_state_dict(sd, retr_cfg, prefix="retriever.query_contriever."),
            "passage_contriever": bert_params_from_state_dict(sd, retr_cfg, prefix="retriever.passage_contriever."),
        }

    os.makedirs(dest, exist_ok=True)
    flat = tree_to_flat({"reader": reader, "retriever": retr}, "model")
    np.savez(os.path.join(dest, "state.npz"), **flat)
    import dataclasses

    cfg = AtlasConfig(reader_model_type=reader_model_type,
                      query_side_retriever_training=query_side)
    with open(os.path.join(dest, "meta.json"), "w") as f:
        json.dump({"step": int(ckpt.get("step", 0)), "cfg": dataclasses.asdict(cfg)}, f)
    print(f"wrote checkpoint to {dest} (step {ckpt.get('step', 0)})")


def convert_index(src: str, dest: str, n_shards: int) -> None:
    import torch

    os.makedirs(dest, exist_ok=True)
    n_total, dim = 0, None
    for i in range(n_shards):
        emb = torch.load(os.path.join(src, f"embeddings.{i}.pt"), map_location="cpu")
        emb = emb.to(torch.float16).numpy()
        if emb.shape[0] < emb.shape[1]:  # reference layout is (dim, n) -> ours (n, dim)
            emb = emb.T
        dim = emb.shape[1]
        np.save(os.path.join(dest, f"embeddings.{i}.npy"), np.ascontiguousarray(emb))
        with open(os.path.join(src, f"passages.{i}.pt"), "rb") as f:
            passages = pickle.load(f)
        with open(os.path.join(dest, f"passages.{i}.jsonl"), "w", encoding="utf-8") as f:
            for p in passages:
                f.write(json.dumps(p, ensure_ascii=False) + "\n")
        n_total += emb.shape[0]
        if i % 16 == 0:
            print(f"shard {i}/{n_shards} done ({n_total} passages)")
    with open(os.path.join(dest, "index_meta.json"), "w") as f:
        json.dump({"n_total": n_total, "dim": dim, "total_saved_shards": n_shards}, f)
    print(f"wrote {n_shards} shards, {n_total} passages, dim {dim} to {dest}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    pc = sub.add_parser("checkpoint")
    pc.add_argument("--src", required=True)
    pc.add_argument("--dest", required=True)
    pc.add_argument("--reader_model_type", required=True)
    pc.add_argument("--query_side_retriever_training", action="store_true")
    pi = sub.add_parser("index")
    pi.add_argument("--src", required=True)
    pi.add_argument("--dest", required=True)
    pi.add_argument("--n_shards", type=int, default=128)
    args = parser.parse_args()
    if args.cmd == "checkpoint":
        convert_checkpoint(args.src, args.dest, args.reader_model_type,
                           args.query_side_retriever_training)
    else:
        convert_index(args.src, args.dest, args.n_shards)
