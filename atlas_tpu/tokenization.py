"""Tokenizers.

Production path: `load_tokenizer` loads a real HF tokenizer (SentencePiece T5 /
WordPiece BERT) from a local path — the reference's tokenizers
(/root/reference/src/model_io.py:34-38,78) come from the hub; in an air-gapped TPU pod
the assets are provided on disk.

Dev/test path: ByteTokenizer — a fully deterministic, reversible byte-level tokenizer
(ByT5-flavored) implementing the subset of the HF interface the framework uses
(__call__ with padding/truncation, decode, vocab, additional_special_tokens_ids,
sentinel <extra_id_k> tokens, T5 </s> appending or BERT [CLS]/[SEP] wrapping). It lets
every pipeline — MLM span corruption, QA prompts, generation, MCQA permutation
machinery — run end-to-end with no downloaded assets.

Vocab layout (byte mode): 0=pad, 1=</s>, 2=unk, 3=[CLS], 4=[SEP], 5=[MASK],
6..261=bytes, sentinels at the top: <extra_id_k> = vocab_size-1-k (T5 convention).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

_SPECIAL_RE = re.compile(r"(<extra_id_\d+>|</s>|\[CLS\]|\[SEP\]|\[MASK\]|<pad>)")

PAD_ID = 0
EOS_ID = 1
UNK_ID = 2
CLS_ID = 3
SEP_ID = 4
MASK_ID = 5
BYTE_OFFSET = 6
N_SENTINELS = 100


class ByteTokenizer:
    """Reversible byte-level tokenizer with T5- or BERT-style special-token handling."""

    def __init__(self, style: str = "t5", vocab_size: int = 384):
        assert style in ("t5", "bert")
        assert vocab_size >= BYTE_OFFSET + 256 + N_SENTINELS
        self.style = style
        self.vocab_size = vocab_size
        self.pad_token_id = PAD_ID
        self.eos_token_id = EOS_ID
        self.unk_token_id = UNK_ID
        self.cls_token_id = CLS_ID
        self.sep_token_id = SEP_ID
        self.mask_token_id = MASK_ID

    # T5 sentinel convention: <extra_id_0> is the LAST vocab id
    def sentinel_id(self, k: int) -> int:
        return self.vocab_size - 1 - k

    @property
    def additional_special_tokens_ids(self) -> List[int]:
        return [self.sentinel_id(k) for k in range(N_SENTINELS)]

    @property
    def vocab(self) -> Dict[str, int]:
        v = {"<pad>": PAD_ID, "</s>": EOS_ID, "<unk>": UNK_ID,
             "[CLS]": CLS_ID, "[SEP]": SEP_ID, "[MASK]": MASK_ID}
        for b in range(256):
            v[f"<0x{b:02X}>"] = BYTE_OFFSET + b
        for k in range(N_SENTINELS):
            v[f"<extra_id_{k}>"] = self.sentinel_id(k)
        return v

    def get_vocab(self) -> Dict[str, int]:
        return self.vocab

    def __len__(self) -> int:
        return self.vocab_size

    # ------------------------------------------------------------------ encoding

    def _encode_str(self, text: str) -> List[int]:
        ids: List[int] = []
        for piece in _SPECIAL_RE.split(text):
            if not piece:
                continue
            if piece.startswith("<extra_id_"):
                ids.append(self.sentinel_id(int(piece[len("<extra_id_"):-1])))
            elif piece == "</s>":
                ids.append(EOS_ID)
            elif piece == "<pad>":
                ids.append(PAD_ID)
            elif piece == "[CLS]":
                ids.append(CLS_ID)
            elif piece == "[SEP]":
                ids.append(SEP_ID)
            elif piece == "[MASK]":
                ids.append(MASK_ID)
            else:
                ids.extend(BYTE_OFFSET + b for b in piece.encode("utf-8"))
        return ids

    def __call__(
        self,
        text: Union[str, Sequence[str]],
        padding: Union[bool, str] = False,
        max_length: Optional[int] = None,
        truncation: bool = False,
        return_tensors: Optional[str] = None,
        add_special_tokens: bool = True,
        **_,
    ) -> Dict[str, np.ndarray]:
        single = isinstance(text, str)
        texts = [text] if single else list(text)
        seqs = []
        for t in texts:
            ids = self._encode_str(t)
            if add_special_tokens:
                if self.style == "t5":
                    ids = ids + [EOS_ID]
                else:
                    ids = [CLS_ID] + ids + [SEP_ID]
            if truncation and max_length is not None and len(ids) > max_length:
                ids = ids[:max_length]
                if add_special_tokens and self.style == "bert":
                    ids[-1] = SEP_ID
            seqs.append(ids)

        if padding == "max_length" and max_length is not None:
            pad_to = max_length
        elif padding in (True, "longest"):
            pad_to = max(len(s) for s in seqs) if seqs else 0
        else:
            pad_to = None

        if pad_to is not None:
            input_ids = np.full((len(seqs), max(pad_to, 1)), PAD_ID, dtype=np.int32)
            attention_mask = np.zeros_like(input_ids)
            for i, s in enumerate(seqs):
                input_ids[i, : len(s)] = s
                attention_mask[i, : len(s)] = 1
            out = {"input_ids": input_ids, "attention_mask": attention_mask}
        else:
            out = {
                "input_ids": [np.asarray(s, dtype=np.int32) for s in seqs],
                "attention_mask": [np.ones(len(s), dtype=np.int32) for s in seqs],
            }
            if single and return_tensors is None:
                return {"input_ids": list(map(int, seqs[0])),
                        "attention_mask": [1] * len(seqs[0])}
        if return_tensors == "jax":
            import jax.numpy as jnp

            out = {k: jnp.asarray(v) for k, v in out.items()}
        return out

    def batch_encode_plus(self, texts, **kw):
        return self(texts, **kw)

    # ------------------------------------------------------------------ decoding

    def decode(self, ids, skip_special_tokens: bool = False) -> str:
        pieces: List[str] = []
        byte_buf: List[int] = []

        def flush():
            if byte_buf:
                pieces.append(bytes(byte_buf).decode("utf-8", errors="replace"))
                byte_buf.clear()

        for i in np.asarray(ids).reshape(-1).tolist():
            i = int(i)
            if BYTE_OFFSET <= i < BYTE_OFFSET + 256:
                byte_buf.append(i - BYTE_OFFSET)
                continue
            flush()
            if skip_special_tokens:
                continue
            if i == PAD_ID:
                pieces.append("<pad>")
            elif i == EOS_ID:
                pieces.append("</s>")
            elif i == CLS_ID:
                pieces.append("[CLS]")
            elif i == SEP_ID:
                pieces.append("[SEP]")
            elif i == MASK_ID:
                pieces.append("[MASK]")
            elif i >= self.vocab_size - N_SENTINELS:
                pieces.append(f"<extra_id_{self.vocab_size - 1 - i}>")
        flush()
        return "".join(pieces)

    def batch_decode(self, batch_ids, skip_special_tokens: bool = False) -> List[str]:
        return [self.decode(ids, skip_special_tokens) for ids in batch_ids]


def load_tokenizer(name_or_path: str, style: str = "t5", vocab_size: int = 384):
    """HF tokenizer from a local path if available, else ByteTokenizer fallback."""
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(name_or_path, local_files_only=True)
    except Exception:
        import logging

        logging.getLogger(__name__).warning(
            "no local tokenizer assets for %r — using the built-in ByteTokenizer", name_or_path
        )
        return ByteTokenizer(style=style, vocab_size=vocab_size)
