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

It drives the actual CLI (`train.py`) three times — a phase-0 reader
pretrain with gold passages provided (--use_file_passages; the reference
recipe also starts from PRETRAINED towers — a from-scratch joint bootstrap
never ignites, chip v3), then the full recipe from that checkpoint (ppmean
gold, retriever training, periodic index refresh, real offline-built HF fast
tokenizers via --reader_tokenizer_path), and a --closed_book control from the
same checkpoint — then loads the trained checkpoint and measures standalone
retriever recall@1 against the random-init retriever
(distillation-teaches-retrieval at recipe scale; CPU-toy version:
tests/test_learnability.py).

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

ATTRS = ["color", "shape", "size", "sound"]


def build_world(n_entities=32, seed=0):
    """One fact per passage: query and gold passage share the (attr, entity)
    bigram, so retrieval is lexically learnable by a from-scratch tower, and
    the reader's job is copy-the-last-word — the minimal composition the real
    NQ recipe exercises (retrieve -> extract). Values are unique per fact, so
    the held-out closed-book chance floor is ~1/128; open must clearly beat
    it via retrieval."""
    r = random.Random(seed)
    entities = [f"object{i:03d}" for i in range(n_entities)]
    # UNIQUE random value per fact: memorizing the train q->a map cannot
    # transfer to held-out pairs (the r05 chip run v2 showed a tiny reader
    # memorizes ~550 shared-vocab answers outright — loss 0.70 — which makes
    # ppmean gold scores retrieval-independent and collapses the retriever).
    # With unique values, copy-from-the-gold-passage is the ONLY rule that
    # generalizes, and gold conditional likelihoods favor the gold passage as
    # soon as the reader learns to copy.
    pairs = [(e, a) for e in entities for a in ATTRS]
    uniq = [f"val{i:03d}x" for i in range(len(pairs))]
    r.shuffle(uniq)
    facts = {e: {} for e in entities}
    for (e, a), v in zip(pairs, uniq):
        facts[e][a] = v
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
              refresh_every=0, per_gpu_batch_size=None, use_file_passages=False,
              model_path=None, train_file="train.jsonl", eval_freq=None,
              lr=None, n_context=16):
    # n_context 16 of the 128-passage corpus in the joint phase: the
    # random-init retriever puts the gold passage in context ~12.5% of the
    # time, enough gold sightings to ignite distillation (at 480 passages x
    # top-4 the bootstrap probability was ~0.8% and the cycle never started)
    env = dict(os.environ, PYTHONPATH=REPO if cpu
               else f"{REPO}:{os.path.expanduser('~')}/.axon_site")
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    args = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--tiny_model", "--tiny_model_dim", "64",
        "--name", name, "--checkpoint_dir", os.path.join(tmp, "ckpt"),
        "--train_data", os.path.join(tmp, train_file),
        "--eval_data", os.path.join(tmp, "eval.jsonl"),
        "--passages", os.path.join(tmp, "passages.jsonl"),
        "--task", "qa", "--total_steps", str(steps),
        "--per_gpu_batch_size", str(per_gpu_batch_size or (1 if cpu else 8)),
        "--n_context", str(n_context), "--retriever_n_context", str(n_context),
        "--text_maxlength", "64", "--target_maxlength", "8",
        "--generation_max_length", "8", "--warmup_steps", "4",
        "--lr", str(lr if lr is not None else 3e-3),
        "--lr_retriever", "1e-3", "--scheduler", "fixed",
        "--log_freq", "10", "--eval_freq", str(eval_freq or max(steps // 2, 1)),
        "--save_freq", str(steps), "--dropout", "0.0",
        # protect the random-init lexical prior while the reader is still
        # noise (early gold scores would distill garbage into the retriever)
        "--freeze_retriever_steps", str(max(steps // 6, 1)),
        "--reader_tokenizer_path", t5_dir, "--retriever_tokenizer_path", bert_dir,
        "--gold_score_mode", "ppmean", "--precision", "fp32", "--shuffle",
        # terse formats (the shapes tests/test_learnability.py proved learnable
        # at tiny dims): less template noise between the matching tokens
        "--qa_prompt_format", "q: {question}",
        "--encoder_format", "{query} {text}",
    ]
    if model_path:
        args += ["--model_path", model_path]
    if use_file_passages:
        # phase 0 warms BOTH towers, as the reference's pretrained models do:
        # the reader learns copy-from-context, and train_retriever distills
        # "which of these 4 given passages is gold" into the retriever (the
        # gold-score KL runs on file passages too — no index needed). Without
        # the retriever warmup the joint phase starts with ~random retrieval,
        # the reader can only fit train data by memorizing, and the copy skill
        # + gold signal collapse together (chip v5/v6).
        args += ["--use_file_passages", "--train_retriever"]
    elif closed_book:
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
        task="qa", qa_prompt_format="q: {question}",
        encoder_format="{query} {text}",
        tiny_model=True, tiny_model_dim=64, precision="fp32", n_context=4,
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
    # queries must go through the TASK FORMAT the retriever was trained on
    # ("question: ... answer: <extra_id_0>"): raw questions mis-measure
    from atlas_tpu.tasks import get_task

    task = get_task(cfg, atlas.reader_tokenizer)
    qs = [e["question"] for e in evals]
    q_fmt = [task.process(dict(e))["query"] for e in evals]
    qenc = atlas.retriever_tokenize(q_fmt)
    qemb = np.asarray(atlas.embed_queries_device(qenc["input_ids"],
                                                 qenc["attention_mask"]))
    rank = np.argsort(-(qemb @ pemb.T), axis=1)

    def parse(q):  # "what is the {attr} of {entity}?"
        attr = q.split("what is the ")[1].split(" of ")[0]
        ent = q.split(" of ")[1].rstrip("?").strip()
        return ent, attr

    gold = np.array([gold_row[parse(q)] for q in qs])
    r1 = float((rank[:, 0] == gold).mean())
    r16 = float((rank[:, :16] == gold[:, None]).any(axis=1).mean())
    return r1, r16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--refresh_every", type=int, default=150)
    # GLOBAL batch ~8: per-device batch is multiplied by local dp rows, so the
    # 8-device CPU mesh uses 1/device while the single-chip run uses 8
    ap.add_argument("--per_gpu_batch_size", type=int, default=None)
    ap.add_argument("--phase0_steps", type=int, default=1500)
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
             + ["question answer <extra_id_0> title context text : . ? q"])
    t5_dir, bert_dir = build_tokenizers(tmp, texts)

    # PHASE 0 — reader pretraining with GOLD passages provided
    # (--use_file_passages): the reference recipe starts from a PRETRAINED
    # reader whose per-passage gold likelihoods are informative from step 1;
    # from-scratch joint training has no such bootstrap (chip v3: with a
    # 480-passage corpus and random-init retrieval the copy rule never gets
    # enough gold sightings to ignite). Train pairs only — held-out eval
    # pairs stay unseen. The reader learns retrieve-agnostic copy; both the
    # open recipe AND the closed-book control resume from this checkpoint.
    # Phase-0 facts are INCONSISTENT across examples (a fresh random value per
    # example): the same question maps to different answers in different
    # examples, so memorizing q->a cannot fit the data — copying the value
    # from the passage matching the question's (attr, entity) is the ONLY
    # solution (test_learnability's infinite-random-pairs trick, via the CLI).
    # chip v8 probe: with CONSISTENT phase-0 facts the tiny reader memorized
    # (train preds right without gold in context, held-out copy dead).
    r = random.Random(1)
    attrs = ATTRS
    ents = sorted({e for (e, a) in gold_row})
    vals = sorted({q["answers"][0] for q in train_qa + eval_qa})
    # curriculum (the shape tests/test_learnability.py PROVED learnable at
    # these dims): 0a = copy-only, ONE gold passage per example — no selection
    # ambiguity, the reader must read; 0b = gold + 3 distractors — learns
    # selection on top of the copy skill. Without 0a the selection task
    # plateaus at ln(4) = "one of the in-context values" (chip v9/v10/v11).
    def fact(r):
        e, a = r.choice(ents), r.choice(attrs)
        return e, a, r.choice(vals)

    with open(os.path.join(tmp, "train_p0a.jsonl"), "w") as f:
        for _ in range(4000):
            e, a, v = fact(r)
            f.write(json.dumps({
                "question": f"what is the {a} of {e}?", "answers": [v],
                "passages": [{"id": "g", "title": f"{e} {a}",
                              "text": f"the {a} of {e} is {v} ."}]}) + "\n")
    with open(os.path.join(tmp, "train_p0.jsonl"), "w") as f:
        for _ in range(4000):
            e, a, v = fact(r)
            gold = {"id": "g", "title": f"{e} {a}",
                    "text": f"the {a} of {e} is {v} ."}
            ctx = [gold]
            for _d in range(3):
                de, da = r.choice(ents), r.choice(attrs)
                while (de, da) == (e, a):
                    de, da = r.choice(ents), r.choice(attrs)
                ctx.append({"id": "d", "title": f"{de} {da}",
                            "text": f"the {da} of {de} is {r.choice(vals)} ."})
            r.shuffle(ctx)
            f.write(json.dumps({"question": f"what is the {a} of {e}?",
                                "answers": [v], "passages": ctx}) + "\n")
    p0_steps = args.phase0_steps
    losses_p0a, _, _ = run_train(tmp, "phase0a", max(p0_steps // 2, 800),
                                 t5_dir, bert_dir, args.cpu,
                                 use_file_passages=True, lr=1e-3, n_context=1,
                                 per_gpu_batch_size=args.per_gpu_batch_size,
                                 train_file="train_p0a.jsonl",
                                 eval_freq=p0_steps * 10)
    p0a_ckpt = os.path.join(tmp, "ckpt", "phase0a", "checkpoint", "latest")
    losses_p0, _, _ = run_train(tmp, "phase0", p0_steps,
                                t5_dir, bert_dir, args.cpu,
                                use_file_passages=True, lr=1e-3, n_context=4,
                                model_path=p0a_ckpt,
                                per_gpu_batch_size=args.per_gpu_batch_size,
                                train_file="train_p0.jsonl",
                                # eval.jsonl has no passages field; skip eval
                                # in the file-passages pretrain
                                eval_freq=p0_steps * 10)
    p0_ckpt = os.path.join(tmp, "ckpt", "phase0", "checkpoint", "latest")

    # joint phase with the READER FROZEN (--lr 0): phase 0 made the reader a
    # copy master whose gold scores identify the gold passage; letting it keep
    # training lets it fit the train set by MEMORIZING answers for the ~60% of
    # examples whose context lacks gold, which destroys both the copy skill
    # and the gold signal (chip v7 probe: train preds 8/8 correct WITHOUT gold
    # in context). Frozen-reader distillation is the production
    # retriever-finetuning mode and mirrors tests/test_learnability.py at
    # recipe scale.
    losses, ems, _ = run_train(tmp, "open", args.steps, t5_dir, bert_dir,
                               args.cpu, refresh_every=args.refresh_every,
                               per_gpu_batch_size=args.per_gpu_batch_size,
                               model_path=p0_ckpt, lr=0.0)
    losses_cb, ems_cb, _ = run_train(tmp, "closed", args.steps, t5_dir, bert_dir,
                                     args.cpu, closed_book=True,
                                     per_gpu_batch_size=args.per_gpu_batch_size,
                                     model_path=p0_ckpt)
    r1_after, r16_after = retriever_recall(tmp, "open", t5_dir, bert_dir,
                                           gold_row, args.cpu, trained=True)
    r1_before, r16_before = retriever_recall(tmp, "open", t5_dir, bert_dir,
                                             gold_row, args.cpu, trained=False)

    result = {
        "steps": args.steps,
        "phase0a_loss_last": losses_p0a[-1] if losses_p0a else None,
        "phase0_loss_first": losses_p0[0] if losses_p0 else None,
        "phase0_loss_last": losses_p0[-1] if losses_p0 else None,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "em_open": ems[-1] if ems else None,
        "em_closed_book": ems_cb[-1] if ems_cb else None,
        "retriever_recall1_random_init": round(r1_before, 4),
        "retriever_recall1_trained": round(r1_after, 4),
        "retriever_recall16_random_init": round(r16_before, 4),
        "retriever_recall16_trained": round(r16_after, 4),
        "chance_recall1": round(1.0 / len(passages), 4),
        "tmp": tmp,
    }
    print("MINI_NQ_CANARY " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
