"""
Host-side caption tokenization.

* ``CustomTokenizer`` — word-level tokenizer over a fixed vocabulary with
  [CLS]/[SEP]/[PAD] specials (reference text_encoders.py:142-195). Word
  splitting is a small regex equivalent of ``nltk.word_tokenize`` for the
  caption grammars used by CATER/CLIPort (words, integers incl. negatives,
  parentheses, commas, periods) — no nltk dependency.
* ``T5TokenizerWrapper`` — HuggingFace T5 ("t5-small") SentencePiece
  tokenizer, gated on local availability (no network access is assumed);
  falls back to a deterministic hash tokenizer producing valid T5 ids so the
  full pipeline stays runnable without the pretrained vocab file.
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

import numpy as np

_WORD_RE = re.compile(r"-?\d+|[A-Za-z_]+|[^\w\s]")


def word_tokenize(text: str) -> list[str]:
    return _WORD_RE.findall(text)


class CustomTokenizer:
    """Fixed-vocabulary word tokenizer with batch padding."""

    is_fallback = False  # real tokenization — ids match the reference's vocab

    def __init__(self, vocabulary: dict[str, int]):
        assert "[PAD]" in vocabulary, "Vocabulary must contain '[PAD]' token"
        self.vocabulary = vocabulary
        self.vocabulary_reverse = {v: k for k, v in vocabulary.items()}
        self.padding_idx = vocabulary["[PAD]"]

    def tokenize(self, caption: str) -> tuple[np.ndarray, int]:
        words = word_tokenize(caption)
        ids = [self.vocabulary["[CLS]"]]
        ids += [self.vocabulary[w] for w in words]
        ids.append(self.vocabulary["[SEP]"])
        return np.asarray(ids, dtype=np.int32), len(ids)

    def tokenize_batch(self, captions: list[str]) -> tuple[np.ndarray, np.ndarray]:
        toks, lengths = zip(*(self.tokenize(c) for c in captions))
        max_len = max(lengths)
        out = np.full((len(captions), max_len), self.padding_idx, dtype=np.int32)
        for i, t in enumerate(toks):
            out[i, : len(t)] = t
        return out, np.asarray(lengths, dtype=np.int32)

    def tokens_to_text(self, tokens) -> str:
        return " ".join(self.vocabulary_reverse[int(t)] for t in tokens)

    def __call__(self, captions: list[str]):
        tokens, lengths = self.tokenize_batch(captions)
        return {"caption_tokens": tokens, "caption_lengths": lengths, "attn_masks": None}


class HashFallbackT5Tokenizer:
    """
    Deterministic stand-in for the T5 SentencePiece tokenizer when the
    pretrained vocab is unavailable offline: maps each word to a stable id in
    [1000, 31000), appends EOS (id 1), pads with 0 and emits attention masks —
    the exact tensor contract of the real tokenizer. Token ids do NOT match
    the real T5 vocabulary — any downstream result is marked non-comparable.
    """

    is_fallback = True
    eos_id = 1
    pad_id = 0

    def _word_id(self, word: str) -> int:
        h = int(hashlib.md5(word.lower().encode()).hexdigest(), 16)
        return 1000 + (h % 30000)

    def __call__(self, captions: list[str]):
        seqs = [[self._word_id(w) for w in word_tokenize(c)] + [self.eos_id] for c in captions]
        max_len = max(len(s) for s in seqs)
        tokens = np.full((len(seqs), max_len), self.pad_id, dtype=np.int32)
        masks = np.zeros((len(seqs), max_len), dtype=np.int32)
        for i, s in enumerate(seqs):
            tokens[i, : len(s)] = s
            masks[i, : len(s)] = 1
        lengths = np.full((len(seqs),), max_len, dtype=np.int32)
        return {"caption_tokens": tokens, "caption_lengths": lengths, "attn_masks": masks}


class T5TokenizerWrapper:
    """HuggingFace T5 tokenizer producing the reference collate contract
    (reference Cater.py:150-168): padded ids + attention masks; lengths are
    the padded length for every element."""

    is_fallback = False

    def __init__(self, model_name: str = "t5-small"):
        from transformers import T5Tokenizer  # local files only — no egress

        self.tok = T5Tokenizer.from_pretrained(model_name, local_files_only=True)

    def __call__(self, captions: list[str]):
        out = self.tok(captions, padding=True, return_tensors="np")
        tokens = out["input_ids"].astype(np.int32)
        masks = out["attention_mask"].astype(np.int32)
        lengths = np.full((tokens.shape[0],), tokens.shape[1], dtype=np.int32)
        return {"caption_tokens": tokens, "caption_lengths": lengths, "attn_masks": masks}


def get_tokenizer(name: str, vocabulary: Optional[dict] = None):
    """Tokenizer factory: 'T5' or 'CustomTokenizer' (reference Cater.py:105-119)."""
    if name == "CustomTokenizer":
        if vocabulary is None:
            raise ValueError("CustomTokenizer requires a vocabulary")
        return CustomTokenizer(vocabulary)
    if name == "T5":
        try:
            return T5TokenizerWrapper()
        except Exception:
            import warnings

            warnings.warn(
                "T5 SentencePiece vocab unavailable offline — using the "
                "deterministic HASH tokenizer. Token ids do not match the real "
                "T5 vocabulary; eval results will carry "
                "'tokenizer_fallback': true.",
                stacklevel=2,
            )
            return HashFallbackT5Tokenizer()
    raise NameError(f"Unknown tokenizer {name!r}. Use 'T5'|'CustomTokenizer'")
