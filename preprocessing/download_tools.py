"""Download helpers + artifact registry.

Role parity: /root/reference/preprocessing/download_tools.py + the three download
CLIs. The artifact names/URLs are the reference's published public assets
(dl.fbaipublicfiles.com/atlas), so a user of the reference finds the same registry
here; downloading uses urllib (no wget dependency).
"""

from __future__ import annotations

import os
import shutil
import sys
import urllib.request

BASE_URL = "https://dl.fbaipublicfiles.com/atlas"

WIKI_DUMPS = ["enwiki-dec2017", "enwiki-dec2018", "enwiki-aug2019", "enwiki-dec2020", "enwiki-dec2021"]
AVAILABLE_CORPORA = {
    f"corpora/wiki/{d}": {
        "corpus": f"corpora/wiki/{d}",
        "description": f"Wikipedia dump from {d.split('-')[1]}, preprocessed into passages",
        "files": ["text-list-100-sec.jsonl", "infobox.jsonl"],
    }
    for d in WIKI_DUMPS
}

_SIZES = ["xxl", "xl", "large", "base"]
AVAILABLE_MODELS = [
    *({"model": f"models/atlas/{s}", "description": f"Pretrained Atlas {s} model"} for s in _SIZES),
    *({"model": f"models/atlas_nq/{s}", "description": f"Atlas {s} model finetuned on Natural Questions"} for s in _SIZES),
]
MODEL_FILE_NAME = "model.pth.tar"

AVAILABLE_INDICES = [
    *({"index": f"indices/atlas/wiki/{s}",
       "description": f"Precomputed wiki-dec2018 index for the pretrained atlas {s} model"} for s in _SIZES),
    *({"index": f"indices/atlas_nq/wiki/{s}",
       "description": f"Precomputed wiki-dec2018 index for the NQ-finetuned atlas {s} model"} for s in _SIZES),
]
N_INDEX_SHARDS = 128


def maybe_download_file(source: str, target) -> None:
    target = str(target)
    if os.path.exists(target):
        return
    os.makedirs(os.path.dirname(target) or ".", exist_ok=True)
    print(f"Downloading {source} to {target}")
    tmp = target + ".part"
    with urllib.request.urlopen(source) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f, length=1 << 20)
    os.replace(tmp, target)


def get_s3_path(path: str) -> str:
    return f"{BASE_URL}/{path}"


def get_download_path(output_dir: str, path: str) -> str:
    return os.path.join(output_dir, path)
