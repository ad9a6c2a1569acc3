#!/usr/bin/env python
"""Download a prebuilt 128-shard passage index (role parity: reference
preprocessing/download_index.py). Convert the torch shards to the atlas_tpu shard
format with tools/convert_torch_artifacts.py."""

import argparse

from download_tools import AVAILABLE_INDICES, N_INDEX_SHARDS, get_download_path, get_s3_path, maybe_download_file


def main(output_directory: str, requested_index: str) -> None:
    for shard in range(N_INDEX_SHARDS):
        for fname in (f"passages.{shard}.pt", f"embeddings.{shard}.pt"):
            path = f"{requested_index}/{fname}"
            maybe_download_file(get_s3_path(path), get_download_path(output_directory, path))


if __name__ == "__main__":
    help_str = "Available indices:\n" + "\n".join(
        f'  {m["index"]:<28} {m["description"]}' for m in AVAILABLE_INDICES
    )
    parser = argparse.ArgumentParser(description=help_str,
                                     formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--index", required=True, choices=[m["index"] for m in AVAILABLE_INDICES])
    parser.add_argument("--output_directory", default="./data/")
    args = parser.parse_args()
    main(args.output_directory, args.index)
