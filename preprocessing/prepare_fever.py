#!/usr/bin/env python
"""Build FEVER train/dev/test jsonl (role parity: reference
preprocessing/prepare_fever.py), including the canonical 64-shot subset
(ids in data/fewshot_ids.json)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from download_tools import maybe_download_file

FEWSHOT_IDS = set(json.load(open(Path(__file__).parent / "data" / "fewshot_ids.json"))["fever_64shot"])

URLS = {
    "train": "https://fever.ai/download/fever/train.jsonl",
    "dev": "https://fever.ai/download/fever/shared_task_dev.jsonl",
    "test": "https://fever.ai/download/fever/shared_task_test.jsonl",
}


def main(args) -> None:
    out = Path(args.output_directory) / "fever_data"
    out.mkdir(parents=True, exist_ok=True)
    for split, url in URLS.items():
        dest = out / f"{split}.jsonl"
        if args.overwrite or not dest.exists():
            maybe_download_file(url, dest)
    with open(out / "train.jsonl") as fin, open(out / "train-64.jsonl", "w") as fout:
        for k, line in enumerate(fin):
            if k in FEWSHOT_IDS:
                fout.write(json.dumps(json.loads(line)) + "\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_directory", type=str, default="./data/")
    parser.add_argument("--overwrite", action="store_true")
    main(parser.parse_args())
