#!/usr/bin/env python
"""Build NaturalQuestions / TriviaQA train/dev/test jsonl files, including the
canonical 64-shot subsets.

Role parity: reference preprocessing/prepare_qa.py. The canonical 64-shot example
indices (the exact random draws published with the reference) live in
data/fewshot_ids.json so the few-shot splits are bit-identical.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tarfile
from pathlib import Path

from download_tools import maybe_download_file

FEWSHOT_IDS = json.load(open(Path(__file__).parent / "data" / "fewshot_ids.json"))

FID_INDEX_URL = "https://dl.fbaipublicfiles.com/FiD/data/dataindex.tar.gz"
TRIVIAQA_URL = "http://nlp.cs.washington.edu/triviaqa/data/triviaqa-unfiltered.tar.gz"
NQ_BASE = "https://raw.githubusercontent.com/google-research-datasets/natural-questions/master/nq_open"


def convert_triviaqa(ex: dict) -> dict:
    target = ex["Answer"]["Value"]
    if target.isupper():
        target = target.title()
    return {"question": ex["Question"], "answers": ex["Answer"]["Aliases"], "target": target}


def convert_nq(ex: dict) -> dict:
    return {"question": ex["question"], "answers": ex["answer"]}


def _dump(rows, path: Path) -> None:
    with open(path, "w") as f:
        for ex in rows:
            json.dump(ex, f, ensure_ascii=False)
            f.write("\n")


def _load_jsonl(path: Path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def preprocess_nq(orig_dir: Path, output_dir: Path, index_dir: Path) -> None:
    index = {s: json.load(open(index_dir / f"NQ.{s}.idx.json")) for s in ("train", "dev", "test")}
    train = _load_jsonl(orig_dir / "NQ-open.train.jsonl")
    dev = _load_jsonl(orig_dir / "NQ-open.dev.jsonl")
    _dump([convert_nq(train[k]) for k in index["train"]], output_dir / "train.jsonl")
    _dump([convert_nq(train[k]) for k in FEWSHOT_IDS["nq_64shot"]], output_dir / "train.64-shot.jsonl")
    _dump([convert_nq(train[k]) for k in index["dev"]], output_dir / "dev.jsonl")
    _dump([convert_nq(dev[k]) for k in index["test"]], output_dir / "test.jsonl")


def preprocess_triviaqa(orig_dir: Path, output_dir: Path, index_dir: Path) -> None:
    index = {s: json.load(open(index_dir / f"TQA.{s}.idx.json")) for s in ("train", "dev", "test")}
    with open(orig_dir / "triviaqa-unfiltered" / "unfiltered-web-train.json") as f:
        train = json.load(f)["Data"]
    with open(orig_dir / "triviaqa-unfiltered" / "unfiltered-web-dev.json") as f:
        dev = json.load(f)["Data"]
    _dump([convert_triviaqa(train[k]) for k in index["train"]], output_dir / "train.jsonl")
    _dump([convert_triviaqa(train[k]) for k in FEWSHOT_IDS["triviaqa_64shot"]],
          output_dir / "train.64-shot.jsonl")
    _dump([convert_triviaqa(train[k]) for k in index["dev"]], output_dir / "dev.jsonl")
    _dump([convert_triviaqa(dev[k]) for k in index["test"]], output_dir / "test.jsonl")


def main(args) -> None:
    out = Path(args.output_directory)
    out.mkdir(parents=True, exist_ok=True)
    index_dir = out / "dataindex"
    maybe_download_file(FID_INDEX_URL, out / "index.tar")
    if not index_dir.exists():
        with tarfile.open(out / "index.tar") as tar:
            tar.extractall(index_dir)

    nq_dir, tqa_dir = out / "nq_data", out / "triviaqa_data"
    if args.overwrite or not nq_dir.exists():
        orig = out / "original_naturalquestions"
        for split in ("train", "dev"):
            maybe_download_file(f"{NQ_BASE}/NQ-open.{split}.jsonl", orig / f"NQ-open.{split}.jsonl")
        nq_dir.mkdir(parents=True, exist_ok=True)
        preprocess_nq(orig, nq_dir, index_dir)
        shutil.rmtree(orig)
    if args.overwrite or not tqa_dir.exists():
        orig = out / "original_triviaqa"
        maybe_download_file(TRIVIAQA_URL, out / "triviaqa_data.tar")
        if not orig.exists():
            with tarfile.open(out / "triviaqa_data.tar") as tar:
                tar.extractall(orig)
        tqa_dir.mkdir(parents=True, exist_ok=True)
        preprocess_triviaqa(orig, tqa_dir, index_dir)
        shutil.rmtree(orig)
        (out / "triviaqa_data.tar").unlink(missing_ok=True)
    (out / "index.tar").unlink(missing_ok=True)
    shutil.rmtree(index_dir, ignore_errors=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_directory", type=str, default="./data/")
    parser.add_argument("--overwrite", action="store_true")
    main(parser.parse_args())
