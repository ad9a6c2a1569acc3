"""Real HF fast-tokenizer path (the production tokenizer surface).

Everything else in the suite runs on ByteTokenizer; this builds genuine
`tokenizers`-backed HF tokenizers from local assets (no network) with T5/BERT
special-token conventions and drives the host tokenization paths whose semantics
depend on real-tokenizer behavior that ByteTokenizer can mask:

- `load_tokenizer` loading from a local directory (model_io.py:34-38 role),
- `reader_tokenize`'s add_special_tokens=False + textual "</s>" append: special
  tokens must still be MATCHED during tokenization even though the post-processor
  (which would append eos) is suppressed — exactly one trailing eos, never two,
- retriever [CLS]/[SEP] wrapping through the post-processor,
- end-to-end make_batch + greedy generate with the vocab-matched tiny models.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from atlas_tpu.config import AtlasConfig
from atlas_tpu.core.atlas import Atlas
from atlas_tpu.index.flat import DistributedIndex
from atlas_tpu.models.contriever import init_retriever
from atlas_tpu.models.t5 import IGNORE_INDEX, init_t5
from atlas_tpu.parallel.mesh import make_mesh
from atlas_tpu.tokenization import load_tokenizer

import jax

from helpers import tiny_reader_cfg, tiny_retriever_cfg, tiny_passages

CORPUS = [f"this is passage number {i} about topic {i % 7}" for i in range(64)] + [
    "question: what is answer: the answer",
    "title context text",
]


def _build_t5_like(tmp_path):
    from tokenizers import Tokenizer, models, pre_tokenizers, processors, trainers
    from transformers import PreTrainedTokenizerFast

    sentinels = [f"<extra_id_{i}>" for i in range(100)]
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=500, special_tokens=["<pad>", "</s>", "<unk>"] + sentinels
    )
    tok.train_from_iterator(CORPUS, trainer)
    # T5 convention: add_special_tokens=True appends </s>
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", pair="$A </s> $B </s>", special_tokens=[("</s>", 1)]
    )
    hf = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", eos_token="</s>", unk_token="<unk>",
        additional_special_tokens=sentinels, model_max_length=512,
    )
    d = tmp_path / "t5_tok"
    hf.save_pretrained(str(d))
    return str(d)


def _build_bert_like(tmp_path):
    from tokenizers import Tokenizer, models, pre_tokenizers, processors, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.WordPieceTrainer(
        vocab_size=500, special_tokens=["[PAD]", "[CLS]", "[SEP]", "[UNK]", "[MASK]"]
    )
    tok.train_from_iterator(CORPUS, trainer)
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]", pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", 1), ("[SEP]", 2)],
    )
    hf = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="[PAD]", cls_token="[CLS]", sep_token="[SEP]",
        unk_token="[UNK]", mask_token="[MASK]", model_max_length=512,
    )
    d = tmp_path / "bert_tok"
    hf.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def real_atlas(tmp_path_factory, devices):
    tmp = tmp_path_factory.mktemp("tok")
    t5_tok = load_tokenizer(_build_t5_like(tmp))
    bert_tok = load_tokenizer(_build_bert_like(tmp))
    from atlas_tpu.tokenization import ByteTokenizer

    assert not isinstance(t5_tok, ByteTokenizer), "should load the real HF tokenizer"
    assert not isinstance(bert_tok, ByteTokenizer)
    assert t5_tok.pad_token_id == 0 and t5_tok.eos_token_id == 1  # T5Config assumption

    cfg = AtlasConfig(text_maxlength=32, target_maxlength=16, n_context=2,
                      retriever_n_context=2, precision="fp32")
    rcfg = tiny_reader_cfg(vocab_size=len(t5_tok))
    bcfg = tiny_retriever_cfg(vocab_size=len(bert_tok))
    atlas = Atlas(
        cfg, rcfg, init_t5(jax.random.PRNGKey(0), rcfg),
        bcfg, init_retriever(jax.random.PRNGKey(1), bcfg),
        t5_tok, bert_tok,
    )
    return atlas


def test_reader_tokenize_single_eos(real_atlas):
    atlas = real_atlas
    tok = atlas.reader_tokenizer
    labels, dec_in = atlas.reader_tokenize(
        ["question: what is answer: <extra_id_0>"], ["the answer"]
    )
    row = labels[0]
    valid = row[row != IGNORE_INDEX]
    # exactly one eos, in the final valid position (manual "</s>" append matched
    # as a special token despite add_special_tokens=False)
    assert (valid == tok.eos_token_id).sum() == 1
    assert valid[-1] == tok.eos_token_id
    # a target that already ends with </s> must not get a second one
    labels2, _ = atlas.reader_tokenize(["q"], ["the answer</s>"])
    v2 = labels2[0][labels2[0] != IGNORE_INDEX]
    assert (v2 == tok.eos_token_id).sum() == 1
    # decoder inputs start at decoder_start (== pad for T5) and shift right
    assert dec_in[0, 0] == atlas.reader_cfg.decoder_start_token_id
    np.testing.assert_array_equal(dec_in[0, 1:], np.where(row[:-1] == IGNORE_INDEX, 0, row[:-1]))


def test_sentinels_are_atomic(real_atlas):
    tok = real_atlas.reader_tokenizer
    ids = tok(["<extra_id_0> x <extra_id_1>"], add_special_tokens=False)["input_ids"][0]
    s0 = tok.convert_tokens_to_ids("<extra_id_0>")
    s1 = tok.convert_tokens_to_ids("<extra_id_1>")
    assert ids[0] == s0 and ids[-1] == s1
    assert s0 in real_atlas.reader_tokenizer.additional_special_tokens_ids


def test_retriever_cls_sep_wrapping(real_atlas):
    tok = real_atlas.retriever_tokenizer
    enc = real_atlas.retriever_tokenize(["passage number 3"])
    row = enc["input_ids"][0]
    n = int(enc["attention_mask"][0].sum())
    assert row[0] == tok.cls_token_id and row[n - 1] == tok.sep_token_id


def test_make_batch_and_generate_end_to_end(real_atlas, devices):
    atlas = real_atlas
    mesh = make_mesh(4, 2)
    atlas.set_mesh(mesh)
    passages = tiny_passages(24)
    index = DistributedIndex(mesh=mesh, dtype=jnp.float32)
    index.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    atlas.build_index(index, passages, embedder_batch_size=8)

    queries = ["question: what is passage number 3 answer: <extra_id_0>"]
    batch, retrieved = atlas.make_batch(index, queries, ["<extra_id_0> it is three"])
    assert batch["reader_ids"].shape[:2] == (1, 2)
    assert batch["labels"].shape == batch["decoder_input_ids"].shape

    atlas.cfg.generation_max_length = 8
    out = atlas.generate(
        {"input_ids": batch["reader_ids"], "attention_mask": batch["reader_mask"]},
        queries,
    )
    out = np.asarray(out)
    assert out.shape == (1, 8)
    assert out[0, 0] == atlas.reader_cfg.decoder_start_token_id
    # decodes without raising; pad/eos are skippable
    text = atlas.reader_tokenizer.batch_decode(out, skip_special_tokens=True)
    assert isinstance(text[0], str)


def test_tokenizer_thread_safety(real_atlas):
    """HF fast tokenizers panic ("Already borrowed") when two threads enter one
    tokenizer — and the framework tokenizes concurrently by design (the train
    loop's pretokenize worker + the refresh embedder's slab thread + the main
    thread). Atlas wraps both tokenizer objects in a locking facade; this
    hammers them from 4 threads and must see zero rust panics. Without the
    facade this fails within a few iterations (found by the r05 chip canary,
    which crashed mid-overlapped-refresh)."""
    import threading

    atlas = real_atlas
    errors = []

    def hammer(kind):
        try:
            for i in range(60):
                if kind == 0:
                    atlas.pretokenize([f"question {i} about topic {i % 7}?"],
                                      [f"answer {i}"])
                elif kind == 1:
                    atlas.retriever_tokenize([f"this is passage number {i}"])
                elif kind == 2:
                    atlas.tokenize_passages(
                        [f"question {i}?"],
                        [[{"title": f"t{i}", "text": f"passage number {i}"}]])
                else:
                    atlas.reader_tokenizer.decode([5, 6, 7])
        except Exception as e:  # pragma: no cover - the failure being pinned
            errors.append(repr(e))

    threads = [threading.Thread(target=hammer, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
