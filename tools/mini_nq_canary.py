"""Mini-NQ convergence canary (VERDICT r04 item 3): the REAL train.py recipe
on a language-like synthetic QA world, sized for one chip.

The reference's de-facto quality oracle is "the example scripts run and hit the
published EM" (reference README.md:176, example_scripts/nq/train.sh). Real NQ
data and pretrained weights are unreachable offline, so this is the closest
executable analog: a compositional fact world where

  - each (entity, attribute) fact is one corpus passage,
  - train QAs cover a subset of (entity, attribute) pairs,
  - EVAL QAs are HELD-OUT pairs: a closed-book reader structurally cannot know
    them (the values appear only in the corpus), while the retrieval-augmented
    recipe answers by retrieve-and-copy — so EM(open) > EM(closed) measures the
    retrieval pathway itself, not memorization.

It drives the actual CLI (`train.py`) twice — the full recipe (ppmean gold,
retriever training, periodic index refresh, real offline-built HF fast
tokenizers via --reader_tokenizer_path) and a --closed_book control — then
loads the trained checkpoint and measures standalone retriever recall@1
against the random-init retriever (distillation-teaches-retrieval at recipe
scale; CPU-toy version: tests/test_learnability.py).

Usage:
  chip: PYTHONPATH=/root/repo:/root/.axon_site python tools/mini_nq_canary.py
  cpu:  PYTHONPATH=/root/repo python tools/mini_nq_canary.py --cpu [--steps 60]

Prints one JSON line: losses (first/last), EM open vs closed, recall@1
before/after.
"""

import argparse
import json
import os
import random
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ATTRS = ["color", "shape", "size", "sound", "taste"]
VALUES = {
    "color": ["red", "blue", "green", "gold", "violet", "amber", "teal", "coral"],
    "shape": ["round", "square", "flat", "spiky", "oval", "curved", "thin", "wide"],
    "size": ["tiny", "small", "large", "huge", "narrow", "tall", "short", "deep"],
    "sound": ["quiet", "loud", "soft", "sharp", "low", "high", "dull", "clear"],
    "taste": ["sweet", "sour", "salty", "bitter", "mild", "spicy", "plain", "rich"],
}


def build_world(n_entities=96, seed=0):
    """One fact per passage: query and gold passage share the (attr, entity)
    bigram, so retrieval is lexically learnable by a from-scratch tower, and
    the reader's job is copy-the-last-word — the minimal composition the real
    NQ recipe exercises (retrieve -> extract). EM chance floors: closed-book
    can reach ~1/8 (guess the modal value of the asked attribute: values only
    exist in the corpus); open must CLEARLY beat that via retrieval."""
    r = random.Random(seed)
    entities = [f"object{i:03d}" for i in range(n_entities)]
    facts = {e: {a: r.choice(VALUES[a]) for a in ATTRS} for e in entities}
    pairs = [(e, a) for e in entities for a in ATTRS]
    passages = []
    gold_row = {}
    for i, (e, a) in enumerate(pairs):
        passages.append({"id": str(i), "title": f"{e} {a}",
                         "text": f"the {a} of {e} is {facts[e][a]} ."})
        gold_row[(e, a)] = i
    shuffled = pairs[:]
    r.shuffle(shuffled)
    n_eval = max(32, len(shuffled) // 10)
    eval_pairs, train_pairs = shuffled[:n_eval], shuffled[n_eval:]

    def qa(e, a):
        return {"question": f"what is the {a} of {e}?", "answers": [facts[e][a]]}

    return (passages, [qa(e, a) for (e, a) in train_pairs],
            [qa(e, a) for (e, a) in eval_pairs], gold_row)


def build_tokenizers(tmp, texts):
    """Real HF fast tokenizers built offline from the canary corpus (the
    machinery proven by tests/test_real_tokenizer.py)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, processors, trainers
    from transformers import PreTrainedTokenizerFast

    sentinels = [f"<extra_id_{i}>" for i in range(100)]
    t5 = Tokenizer(models.BPE(unk_token="<unk>"))
    t5.pre_tokenizer = pre_tokenizers.Whitespace()
    t5.train_from_iterator(texts, trainers.BpeTrainer(
        vocab_size=800, special_tokens=["<pad>", "</s>", "<unk>"] + sentinels))
    t5.post_processor = processors.TemplateProcessing(
        single="$A </s>", pair="$A </s> $B </s>", special_tokens=[("</s>", 1)])
    hf_t5 = PreTrainedTokenizerFast(
        tokenizer_object=t5, pad_token="<pad>", eos_token="</s>", unk_token="<unk>",
        additional_special_tokens=sentinels, model_max_length=512)
    t5_dir = os.path.join(tmp, "t5_tok")
    hf_t5.save_pretrained(t5_dir)

    bert = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    bert.pre_tokenizer = pre_tokenizers.Whitespace()
    bert.train_from_iterator(texts, trainers.WordPieceTrainer(
        vocab_size=800, special_tokens=["[PAD]", "[CLS]", "[SEP]", "[UNK]", "[MASK]"]))
    bert.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]", pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", 1), ("[SEP]", 2)])
    hf_bert = PreTrainedTokenizerFast(
        tokenizer_object=bert, pad_token="[PAD]", cls_token="[CLS]", sep_token="[SEP]",
        unk_token="[UNK]", mask_token="[MASK]", model_max_length=512)
    bert_dir = os.path.join(tmp, "bert_tok")
    hf_bert.save_pretrained(bert_dir)
    return t5_dir, bert_dir


def run_train(tmp, name, steps, t5_dir, bert_dir, cpu, closed_book=False,
              refresh_every=0, per_gpu_batch_size=None):
    env = dict(os.environ, PYTHONPATH=REPO if cpu
               else f"{REPO}:{os.path.expanduser('~')}/.axon_site")
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    args = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--tiny_model", "--name", name, "--checkpoint_dir", os.path.join(tmp, "ckpt"),
        "--train_data", os.path.join(tmp, "train.jsonl"),
        "--eval_data", os.path.join(tmp, "eval.jsonl"),
        "--passages", os.path.join(tmp, "passages.jsonl"),
        "--task", "qa", "--total_steps", str(steps),
        "--per_gpu_batch_size", str(per_gpu_batch_size or (1 if cpu else 8)),
        "--n_context", "4", "--retriever_n_context", "4",
        "--text_maxlength", "64", "--target_maxlength", "8",
        "--generation_max_length", "8", "--warmup_steps", "4",
        "--lr", "3e-3", "--lr_retriever", "1e-3", "--scheduler", "fixed",
        "--log_freq", "10", "--eval_freq", str(max(steps // 2, 1)),
        "--save_freq", str(steps), "--dropout", "0.0",
        "--reader_tokenizer_path", t5_dir, "--retriever_tokenizer_path", bert_dir,
        "--gold_score_mode", "ppmean", "--precision", "fp32", "--shuffle",
    ]
    if closed_book:
        args += ["--closed_book"]
    else:
        args += ["--train_retriever"]
        if refresh_every:
            args += ["--refresh_index", f"0-1000000:{refresh_every}"]
    r = subprocess.run(args, env=env, capture_output=True, text=True, timeout=7200)
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-4000:]
    losses = [float(m) for m in re.findall(r"loss/train_loss: ([0-9.]+)", out)]
    ems = [float(m) for m in re.findall(r"([0-9.]+) exact_match", out)]
    return losses, ems, out


def retriever_recall(tmp, name, t5_dir, bert_dir, gold_row, cpu, trained):
    """Standalone recall@1: does the (trained|random-init) retriever alone rank
    the gold entity passage first for held-out questions?"""
    import numpy as np

    if cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from atlas_tpu.config import AtlasConfig
    from atlas_tpu.model_io import load_or_initialize_atlas_model
    from atlas_tpu.parallel.mesh import make_mesh, set_global_mesh

    mesh = make_mesh(jax.device_count(), 1)
    set_global_mesh(mesh)
    step_dirs = []
    ckpt = os.path.join(tmp, "ckpt", name, "checkpoint")
    if trained:
        step_dirs = [os.path.join(ckpt, "latest")]
    cfg = AtlasConfig(
        task="qa", tiny_model=True, precision="fp32", n_context=4,
        retriever_n_context=4, text_maxlength=64, target_maxlength=8,
        generation_max_length=8, train_retriever=True, total_steps=1,
        checkpoint_dir=os.path.join(tmp, "rc"), name=f"rc_{trained}",
        reader_tokenizer_path=t5_dir, retriever_tokenizer_path=bert_dir,
        model_path=step_dirs[0] if step_dirs else "none")
    atlas, _, _ = load_or_initialize_atlas_model(cfg)
    atlas.set_mesh(mesh)

    with open(os.path.join(tmp, "eval.jsonl")) as f:
        evals = [json.loads(l) for l in f]
    with open(os.path.join(tmp, "passages.jsonl")) as f:
        passages = [json.loads(l) for l in f]
    # embed corpus + queries with the retriever alone
    ptex = [f"{p['title']} {p['text']}" for p in passages]
    penc = atlas.retriever_tokenizer(ptex, max_length=64, padding="max_length",
                                     truncation=True, return_tensors="np")
    pemb = np.asarray(atlas._embed_jit(atlas.retriever_params, penc["input_ids"],
                                       penc["attention_mask"], is_passages=True))
    qs = [e["question"] for e in evals]
    qenc = atlas.retriever_tokenize(qs)
    qemb = np.asarray(atlas.embed_queries_device(qenc["input_ids"],
                                                 qenc["attention_mask"]))
    top1 = (qemb @ pemb.T).argmax(axis=1)

    def parse(q):  # "what is the {attr} of {entity}?"
        attr = q.split("what is the ")[1].split(" of ")[0]
        ent = q.split(" of ")[1].rstrip("?").strip()
        return ent, attr

    gold = np.array([gold_row[parse(q)] for q in qs])
    return float((top1 == gold).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--refresh_every", type=int, default=150)
    # GLOBAL batch ~8: per-device batch is multiplied by local dp rows, so the
    # 8-device CPU mesh uses 1/device while the single-chip run uses 8
    ap.add_argument("--per_gpu_batch_size", type=int, default=None)
    ap.add_argument("--tmp", default=None)
    args = ap.parse_args()

    tmp = args.tmp or tempfile.mkdtemp(prefix="mini_nq_")
    os.makedirs(tmp, exist_ok=True)
    passages, train_qa, eval_qa, gold_row = build_world()
    with open(os.path.join(tmp, "passages.jsonl"), "w") as f:
        for p in passages:
            f.write(json.dumps(p) + "\n")
    with open(os.path.join(tmp, "train.jsonl"), "w") as f:
        for q in train_qa:
            f.write(json.dumps(q) + "\n")
    with open(os.path.join(tmp, "eval.jsonl"), "w") as f:
        for q in eval_qa:
            f.write(json.dumps(q) + "\n")
    texts = ([p["title"] + " " + p["text"] for p in passages]
             + [q["question"] + " " + q["answers"][0] for q in train_qa]
             + ["question answer <extra_id_0> title context text"])
    t5_dir, bert_dir = build_tokenizers(tmp, texts)

    losses, ems, _ = run_train(tmp, "open", args.steps, t5_dir, bert_dir,
                               args.cpu, refresh_every=args.refresh_every,
                               per_gpu_batch_size=args.per_gpu_batch_size)
    losses_cb, ems_cb, _ = run_train(tmp, "closed", args.steps, t5_dir, bert_dir,
                                     args.cpu, closed_book=True,
                                     per_gpu_batch_size=args.per_gpu_batch_size)
    rec_after = retriever_recall(tmp, "open", t5_dir, bert_dir, gold_row,
                                 args.cpu, trained=True)
    rec_before = retriever_recall(tmp, "open", t5_dir, bert_dir, gold_row,
                                  args.cpu, trained=False)

    result = {
        "steps": args.steps,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "em_open": ems[-1] if ems else None,
        "em_closed_book": ems_cb[-1] if ems_cb else None,
        "retriever_recall1_random_init": round(rec_before, 4),
        "retriever_recall1_trained": round(rec_after, 4),
        "chance_recall1": round(1.0 / len(passages), 4),
        "tmp": tmp,
    }
    print("MINI_NQ_CANARY " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
