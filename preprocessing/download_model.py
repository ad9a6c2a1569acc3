#!/usr/bin/env python
"""Download a pretrained Atlas checkpoint (role parity: reference
preprocessing/download_model.py). Convert to the atlas_tpu format afterwards with
tools/convert_torch_artifacts.py."""

import argparse

from download_tools import AVAILABLE_MODELS, MODEL_FILE_NAME, get_download_path, get_s3_path, maybe_download_file


def main(output_directory: str, requested_model: str) -> None:
    path = f"{requested_model}/{MODEL_FILE_NAME}"
    maybe_download_file(get_s3_path(path), get_download_path(output_directory, path))


if __name__ == "__main__":
    help_str = "Available models:\n" + "\n".join(
        f'  {m["model"]:<24} {m["description"]}' for m in AVAILABLE_MODELS
    )
    parser = argparse.ArgumentParser(description=help_str,
                                     formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--model", required=True, choices=[m["model"] for m in AVAILABLE_MODELS])
    parser.add_argument("--output_directory", default="./data/")
    args = parser.parse_args()
    main(args.output_directory, args.model)
