"""Native C++ jsonl loader vs the python loader: parity on tricky inputs."""

import json

import pytest

from atlas_tpu.index.io import load_passages


@pytest.fixture
def corpus(tmp_path):
    rows = [
        {"id": "0", "title": "plain", "text": "hello world"},
        {"id": "1", "title": 'quo"te', "text": "esc \\ tab\t nl\n end"},
        {"id": "2", "title": "unicode", "text": "café 日本語 \U0001F600"},
        {"id": "3", "title": "T", "section": "S", "text": "merged"},
        {"id": "4", "title": "", "text": "", "extra": {"nested": [1, 2, {"x": "y"}]}},
        {"id": 5, "title": "numeric id", "text": "n"},
        {"id": "6", "text": "no title", "score": 3.14, "flag": True, "none": None},
    ]
    p = tmp_path / "psg.jsonl"
    with open(p, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p), rows


def test_native_matches_python(corpus):
    path, rows = corpus
    native = load_passages([path], native=True)
    python = load_passages([path], native=False)
    assert len(native) == len(python) == len(rows)
    for i in range(len(rows)):
        n, p = native[i], python[i]
        assert n["id"] == str(p["id"]), (i, n, p)
        assert n.get("title", "") == p.get("title", ""), i
        assert n["text"] == p["text"], i


def test_native_section_merge(corpus):
    path, _ = corpus
    native = load_passages([path], native=True)
    assert native[3]["title"] == "T: S"  # index_io.py:31-33 semantics


def test_native_maxload_and_sharding(corpus, tmp_path):
    path, rows = corpus
    store = load_passages([path], maxload=3, native=True)
    assert len(store) == 3
    from atlas_tpu.native import NativePassageStore

    r0 = NativePassageStore([path], world_size=2, rank=0)
    r1 = NativePassageStore([path], world_size=2, rank=1)
    assert len(r0) + len(r1) == len(rows)
    ids = {p["id"] for p in list(r0) + list(r1)}
    assert len(ids) == len(rows)


def test_native_missing_id_errors(tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"title": "x", "text": "y"}\n')
    from atlas_tpu.native import NativePassageStore

    with pytest.raises(ValueError):
        NativePassageStore([str(p)])


def test_native_slice_and_iter(corpus):
    path, _ = corpus
    store = load_passages([path], native=True)
    assert [p["id"] for p in store[1:3]] == ["1", "2"]
    assert store[-1]["id"] == "6"
