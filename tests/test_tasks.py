"""Task framework semantics (process / filter / permutations / iterators)."""

import json

import numpy as np
import pytest

from atlas_tpu.config import AtlasConfig
from atlas_tpu.tasks import get_task
from atlas_tpu.tasks.base import filter_results_by_id
from atlas_tpu.tasks.multiple_choice import Task as MCTask, _get_permutation_orderings
from atlas_tpu.tokenization import ByteTokenizer


def cfg(**kw):
    return AtlasConfig(**kw)


@pytest.fixture(scope="module")
def tok():
    return ByteTokenizer("t5")


def test_get_task_all_eight(tok):
    for name in ["base", "mlm", "lm", "multiple_choice", "kilt", "section", "fever", "qa"]:
        t = get_task(cfg(task=name), tok)
        assert hasattr(t, "process") and hasattr(t, "evaluation")


def test_qa_process(tok):
    t = get_task(cfg(task="qa"), tok)
    ex = t.process({"question": "who?", "answers": ["me"]})
    assert ex["query"] == "question: who? answer: <extra_id_0>"
    assert ex["target"] == "<extra_id_0> me"
    assert ex["passages"] == [{"title": "", "text": ""}]
    m = t.evaluation("me", ["me", "you"])
    assert m["exact_match"] == 1.0 and m["f1"] == 1.0


def test_fever_process(tok):
    t = get_task(cfg(task="fever"), tok)
    assert t.process({"claim": "x", "label": "SUPPORTS"})["target"] == "<extra_id_0> true"
    assert t.process({"claim": "x", "label": "REFUTES"})["target"] == "<extra_id_0> false"
    assert t.process({"claim": "x", "label": "NOT ENOUGH INFO"})["target"] == "<extra_id_0> maybe"


def test_lm_split():
    from atlas_tpu.tasks.lm import Task as LMTask

    text = "one two three four five six seven eight nine ten"
    inp, out = LMTask.split(text, 0.3, 0.7)
    assert inp + out == text
    assert len(inp.split()) >= 1 and len(out.split()) >= 1


def test_mlm_noise(tok):
    t = get_task(cfg(task="mlm", text_maxlength=128), tok)
    ex = t.process({"id": "7", "text": "the quick brown fox jumps over the lazy dog again and again"})
    assert "<extra_id_0>" in ex["query"]
    assert ex["target"].startswith("<extra_id_0>")
    assert ex["metadata"]["clean_target"].startswith("the quick")
    # too-short instances skipped
    t2 = get_task(cfg(task="mlm", min_words_per_lm_instance=100), tok)
    assert t2.process({"id": "8", "text": "short text"}) is None


def test_section_process(tok):
    t = get_task(cfg(task="section"), tok)
    ex = t.process({"id": "1", "title": "T", "section": "S", "text": "body text"})
    assert ex["query"] == "T, S"
    assert ex["target"] == "body text"
    assert t.process({"id": "2", "title": "T", "section": " ", "text": "b"}) is None


def test_kilt_process(tok):
    t = get_task(cfg(task="kilt"), tok)
    ex = t.process({"input": "q", "output": [{"answer": "a1"}, {"answer": ""}, {"answer": "a2"}]})
    assert set(ex["answers"]) == {"a1", "a2"}
    assert ex["query"] == "question: q answer: <extra_id_0>"


def test_filter_results_by_id():
    passages = [[{"id": "1"}, {"id": "2"}, {"id": "3"}]]
    scores = [[0.9, 0.8, 0.7]]
    meta = [{"id": "2"}]
    ps, ss = filter_results_by_id(meta, passages, scores, topk=2)
    assert [p["id"] for p in ps[0]] == ["1", "3"]
    # backfill when filtering leaves < topk
    ps, ss = filter_results_by_id(meta, passages, scores, topk=3)
    assert [p["id"] for p in ps[0]] == ["1", "3", "2"]


def test_permutation_orderings():
    assert _get_permutation_orderings(3, "single") == [[0, 1, 2]]
    cyc = _get_permutation_orderings(3, "cyclic")
    assert len(cyc) == 3 and cyc[0] == [0, 1, 2]
    assert len(_get_permutation_orderings(4, "all")) == 24


def test_mc_permutations_and_marginalization(tok):
    c = cfg(task="multiple_choice", multiple_choice_num_options=3)
    t = get_task(c, tok)
    ex = {"question": "pick", "options": {"A": "apple", "B": "beet", "C": "corn"}, "answer": "B"}
    perms = MCTask.get_permutations(ex, "cyclic")
    assert len(perms) == 3
    assert sum(p["is_original"] for p in perms) == 1
    for p in perms:
        # answer letter follows the moved option
        assert p["options"][p["answer"]] == "beet"

    # simulated predictions: always put high logit on the correct text answer
    dataset = []
    for p in perms:
        proc = t.process(p)
        letter_of_beet = [k for k, v in p["options"].items() if v == "beet"][0]
        logits = {ltr: (5.0 if ltr == letter_of_beet else 0.0) for ltr in t.choices}
        dataset.append({"choice_logits": logits, "metadata": proc["metadata"]})
    reduced = t._reduce_permutations(dataset)
    assert len(reduced) == 1
    assert reduced[0]["generation"] == "B"


def test_data_iterator_rank_sharding(tmp_path):
    f = tmp_path / "d.jsonl"
    with open(f, "w") as fh:
        for i in range(10):
            fh.write(json.dumps({"i": i}) + "\n")
    from atlas_tpu.tasks.base import BaseTask

    r0 = [ex["i"] for ex in BaseTask.data_iterator(str(f), world_rank=0, world_size=2)]
    r1 = [ex["i"] for ex in BaseTask.data_iterator(str(f), world_rank=1, world_size=2)]
    assert sorted(r0 + r1) == list(range(10))
    assert set(r0).isdisjoint(r1)
    # repeat_if_less_than_world_size pads small data
    small = tmp_path / "s.jsonl"
    with open(small, "w") as fh:
        fh.write(json.dumps({"i": 0}) + "\n")
    got = list(BaseTask.data_iterator(str(small), world_rank=3, world_size=4,
                                      repeat_if_less_than_world_size=True))
    assert len(got) >= 1


def test_batch_iterator(tok):
    from atlas_tpu.tasks.base import BaseTask

    data = [{"query": f"q{i}", "target": f"t{i}"} for i in range(5)]
    batches = list(BaseTask.batch_iterator(iter(data), 2))
    assert [b["__size__"] for b in batches] == [2, 2, 1]
    batches = list(BaseTask.batch_iterator(iter(data), 2, drop_last=True))
    assert [b["__size__"] for b in batches] == [2, 2]
