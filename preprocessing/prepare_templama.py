#!/usr/bin/env python
"""Build TempLAMA year-comparison datasets (role parity: reference
preprocessing/prepare_templama.py): for each split, questions whose answer sets
DIFFER between the two years are exported per year — the temporal-staleness probe."""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

from download_tools import maybe_download_file

URLS = {
    "train": "https://storage.googleapis.com/gresearch/templama/train.json",
    "valid": "https://storage.googleapis.com/gresearch/templama/val.json",
    "test": "https://storage.googleapis.com/gresearch/templama/test.json",
}


def prep_question(q: str) -> str:
    return q.replace("_X_", "<extra_id_0>")


def export_obj(obj: dict) -> dict:
    return {
        "question": prep_question(obj["query"]),
        "answers": sorted({n["name"] for n in obj["answer"]}),
        "metadata": {"original_instance": obj},
    }


def main(output_directory: str, years=("2017", "2020")) -> None:
    out = Path(output_directory)
    out.mkdir(parents=True, exist_ok=True)
    for split, url in URLS.items():
        raw = out / f"{split}.original.jsonl"
        maybe_download_file(url, raw)
        by_query: dict = {}
        with open(raw) as f:
            for line in f:
                if line.strip():
                    item = json.loads(line)
                    if item["date"] in years:
                        by_query.setdefault(item["query"], {})[item["date"]] = item
        per_year = {y: [] for y in years}
        for query, items in by_query.items():
            if len(items) != len(years):
                continue
            answer_sets = [sorted({n["name"] for n in items[y]["answer"]}) for y in years]
            if answer_sets[0] == answer_sets[1]:
                continue  # keep only questions whose answer changed between years
            for y in years:
                per_year[y].append(export_obj(items[y]))
        for y in years:
            with open(out / f"temp_lama.{split}.{y}.jsonl", "w") as f:
                for ex in per_year[y]:
                    f.write(json.dumps(ex) + "\n")
        print(f"{split}: {len(per_year[years[0]])} changed-answer questions per year")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_directory", type=str, default="./data/")
    main(parser.parse_args().output_directory)
