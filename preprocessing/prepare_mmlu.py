#!/usr/bin/env python
"""Build MMLU jsonl datasets in three settings (role parity: reference
preprocessing/prepare_mmlu.py):

* 5-shot           — per-domain 5-example train files + combined valid/test
* 5-shot-multitask — one train file combining all domains' 5-shot examples
* full             — auxiliary-train data (minus a 5k validation draw) + multitask
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import random
import tarfile
from pathlib import Path

from download_tools import maybe_download_file

DATA_URL = "https://people.eecs.berkeley.edu/~hendrycks/data.tar"
SPLITS = ("auxiliary_train", "dev", "val", "test")


def row_to_instance(dataset_name: str, row) -> dict:
    q, a, b, c, d, answer = row
    return {
        "question": q,
        "options": {"A": a, "B": b, "C": c, "D": d},
        "answer": answer,
        "dataset": dataset_name,
    }


def load_all(data_dir: Path) -> dict:
    out: dict = {}
    for split in SPLITS:
        for fname in os.listdir(data_dir / split):
            name = fname.replace(".csv", "")
            with open(data_dir / split / fname) as f:
                rows = [row_to_instance(name, r) for r in csv.reader(f)]
            out.setdefault(split, {})[name] = rows
    return out


def _dump(rows, path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for ex in rows:
            f.write(json.dumps(ex) + "\n")


def _strip_split_suffix(domain: str) -> str:
    return "_".join(domain.split("_")[:-1])


def _write_individual(data: dict, split: str, out_dir: Path, suffix: str) -> None:
    for domain, rows in data[split].items():
        _dump(rows, out_dir / f"{_strip_split_suffix(domain)}.{suffix}.jsonl")


def _combined(data: dict, split: str):
    return [ex for rows in data[split].values() for ex in rows]


def build_five_shot(data: dict, out: Path) -> None:
    for domain, rows in data["dev"].items():
        _dump(rows, out / "individual_train" / f"{_strip_split_suffix(domain)}.5-shot-train.jsonl")
    _write_individual(data, "val", out / "individual_valid", "val")
    _write_individual(data, "test", out / "individual_test", "test")
    _dump(_combined(data, "val"), out / "combined_valid.jsonl")
    _dump(_combined(data, "test"), out / "combined_test.jsonl")


def build_five_shot_multitask(data: dict, out: Path) -> None:
    _write_individual(data, "val", out / "individual_valid", "val")
    _write_individual(data, "test", out / "individual_test", "test")
    _dump(_combined(data, "dev"), out / "train.jsonl")
    _dump(_combined(data, "val"), out / "combined_valid.jsonl")
    _dump(_combined(data, "test"), out / "combined_test.jsonl")


def build_full(data: dict, out: Path) -> None:
    _write_individual(data, "val", out / "individual_valid", "val")
    _write_individual(data, "test", out / "individual_test", "test")
    aux = _combined(data, "auxiliary_train")
    random.seed(10)
    random.shuffle(aux)
    _dump(aux[-5000:], out / "auxillary_valid.jsonl")
    _dump(aux[:-5000] + _combined(data, "dev"), out / "train.jsonl")
    _dump(_combined(data, "val"), out / "combined_valid.jsonl")
    _dump(_combined(data, "test"), out / "combined_test.jsonl")


def main(output_directory: str) -> None:
    out = Path(output_directory)
    out.mkdir(parents=True, exist_ok=True)
    maybe_download_file(DATA_URL, out / "data.tar")
    data_dir = out / "data"
    if not data_dir.exists():
        with tarfile.open(out / "data.tar") as tar:
            tar.extractall(out)
    data = load_all(data_dir)
    build_five_shot(data, out / "5-shot")
    build_five_shot_multitask(data, out / "5-shot-multitask")
    build_full(data, out / "full")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_directory", type=str, default="./data/")
    main(parser.parse_args().output_directory)
