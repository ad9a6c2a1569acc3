#!/usr/bin/env python
"""Download a preprocessed corpus (role parity: reference preprocessing/download_corpus.py)."""

import argparse

from download_tools import AVAILABLE_CORPORA, get_download_path, get_s3_path, maybe_download_file


def main(output_directory: str, requested_corpus: str) -> None:
    spec = AVAILABLE_CORPORA[requested_corpus]
    for filename in spec["files"]:
        path = f"{requested_corpus}/{filename}"
        maybe_download_file(get_s3_path(path), get_download_path(output_directory, path))


if __name__ == "__main__":
    help_str = "Available corpora:\n" + "\n".join(
        f'  {c["corpus"]:<32} {c["description"]}' for c in AVAILABLE_CORPORA.values()
    )
    parser = argparse.ArgumentParser(description=help_str,
                                     formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--corpus", required=True, choices=list(AVAILABLE_CORPORA))
    parser.add_argument("--output_directory", default="./data/")
    args = parser.parse_args()
    main(args.output_directory, args.corpus)
