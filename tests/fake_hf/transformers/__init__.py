"""Minimal ``transformers`` stand-in for tests/test_t5_scorer_real.py:
a word-level tokenizer plus a fake T5 whose ``generate`` answers via a
test-provided hook and whose forward emits uniform logits (known CE =
ln(vocab_width), so ``exp(-loss/n)`` is exactly checkable)."""

from __future__ import annotations

import numpy as np

import torch as _t  # resolves to the fake sibling package

LOGIT_VOCAB = 1000  # uniform-forward vocabulary width (CE = ln of this)

_LAST_TOKENIZER = None  # the fake model decodes with the scorer's tokenizer
ANSWER_FN = None  # test hook: input_sentence -> prediction string


def set_answer_fn(fn):
    global ANSWER_FN
    ANSWER_FN = fn


class AutoTokenizer:
    """Word-level with pad id 0; vocabulary grows on demand."""

    def __init__(self):
        self.vocab = {"<pad>": 0}
        self.inv = {0: "<pad>"}

    @classmethod
    def from_pretrained(cls, name, use_fast=False):
        global _LAST_TOKENIZER
        _LAST_TOKENIZER = cls()
        return _LAST_TOKENIZER

    def _id(self, w: str) -> int:
        if w not in self.vocab:
            i = len(self.vocab)
            self.vocab[w] = i
            self.inv[i] = w
        return self.vocab[w]

    def _words(self, text: str):
        return [w for w in text.split(" ") if w != ""]

    def batch_encode_plus(
        self, texts, padding=True, truncation=True, max_length=512,
        return_tensors="pt",
    ):
        seqs = [[self._id(w) for w in self._words(t)][:max_length] for t in texts]
        n = max((len(s) for s in seqs), default=1) or 1
        ids = np.zeros((len(seqs), n), np.int64)
        mask = np.zeros_like(ids)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return {"input_ids": _t.Tensor(ids), "attention_mask": _t.Tensor(mask)}

    def batch_decode(self, ids, skip_special_tokens=True):
        arr = ids.a if isinstance(ids, _t.Tensor) else np.asarray(ids)
        return [
            " ".join(self.inv[int(i)] for i in row if int(i) != 0) for row in arr
        ]


class T5ForConditionalGeneration:
    @classmethod
    def from_pretrained(cls, name):
        return cls()

    def eval(self):
        return self

    def load_state_dict(self, state, strict=False):
        self.loaded_state = dict(state)

    def generate(
        self, input_ids=None, attention_mask=None, max_length=200,
        num_beams=5, early_stopping=True,
    ):
        assert ANSWER_FN is not None, "call transformers.set_answer_fn first"
        texts = _LAST_TOKENIZER.batch_decode(input_ids)
        preds = [ANSWER_FN(t) for t in texts]
        return _LAST_TOKENIZER.batch_encode_plus(preds, max_length=max_length)[
            "input_ids"
        ]

    def __call__(self, input_ids=None, attention_mask=None, labels=None):
        lab = labels.a if isinstance(labels, _t.Tensor) else np.asarray(labels)
        B, N = lab.shape
        out = type("Out", (), {})()
        out.logits = _t.Tensor(np.zeros((B, N, LOGIT_VOCAB)))
        return out
