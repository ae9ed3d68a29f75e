"""BERT WordPiece tokenizer (pure Python) — the text interface of the
Tag2Text captioner (reference init_tokenizer:
/root/reference/eval/vbench/third_party/tag2Text/tag2text.py:387-392,
``BertTokenizer.from_pretrained('bert-base-uncased')`` + the two BLIP
specials [DEC]/[ENC]).

From-the-algorithm reimplementation of bert-base-uncased tokenization:
basic tokenizer (lowercase, NFD accent stripping, punctuation split,
CJK spacing) + greedy longest-match WordPiece with ``##`` continuations.
The 30522-entry vocab file is pure data and must be supplied at runtime
(``vocab_path``); [DEC]/[ENC] are appended as ids 30522/30523 exactly as
``add_special_tokens`` does.
"""

from __future__ import annotations

import unicodedata
from typing import Dict, List, Optional, Sequence

import numpy as np

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"
DEC, ENC = "[DEC]", "[ENC]"


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96
            or 123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
            or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
            or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
            or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F)


def basic_tokenize(text: str, lowercase: bool = True) -> List[str]:
    out = []
    buf = []
    # clean: drop control chars, normalize whitespace, space out CJK
    cleaned = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or unicodedata.category(ch) in \
                ("Cc", "Cf"):
            continue
        if _is_cjk(cp):
            cleaned.append(f" {ch} ")
        elif ch.isspace():
            cleaned.append(" ")
        else:
            cleaned.append(ch)
    for word in "".join(cleaned).split():
        if lowercase:
            word = word.lower()
            word = "".join(c for c in unicodedata.normalize("NFD", word)
                           if unicodedata.category(c) != "Mn")
        for ch in word:
            if _is_punct(ch):
                if buf:
                    out.append("".join(buf))
                    buf = []
                out.append(ch)
            else:
                buf.append(ch)
        if buf:
            out.append("".join(buf))
            buf = []
    return out


class WordPieceTokenizer:
    def __init__(self, vocab_path: str, add_blip_specials: bool = True):
        self.vocab: Dict[str, int] = {}
        with open(vocab_path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\n")] = i
        if add_blip_specials:
            for tok in (DEC, ENC):
                if tok not in self.vocab:
                    self.vocab[tok] = len(self.vocab)
        self.inv = {v: k for k, v in self.vocab.items()}
        self.pad_id = self.vocab[PAD]
        self.unk_id = self.vocab[UNK]
        self.cls_id = self.vocab[CLS]
        self.sep_id = self.vocab[SEP]
        self.bos_id = self.vocab.get(DEC, self.cls_id)
        self.enc_id = self.vocab.get(ENC, self.cls_id)

    def wordpiece(self, word: str, max_chars: int = 100) -> List[int]:
        if len(word) > max_chars:
            return [self.unk_id]
        ids = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for word in basic_tokenize(text):
            ids.extend(self.wordpiece(word))
        return ids

    def __call__(self, texts, max_length: Optional[int] = None,
                 pad_to_max: bool = False):
        """HF-style: [CLS] tokens [SEP], truncation keeps the final
        [SEP]. Returns (ids, attention_mask) int32 arrays."""
        if isinstance(texts, str):
            texts = [texts]
        seqs = []
        for t in texts:
            ids = [self.cls_id] + self.encode(t) + [self.sep_id]
            if max_length is not None and len(ids) > max_length:
                ids = ids[:max_length - 1] + [self.sep_id]
            seqs.append(ids)
        width = max_length if (pad_to_max and max_length) else \
            max(len(s) for s in seqs)
        out = np.full((len(seqs), width), self.pad_id, np.int32)
        mask = np.zeros((len(seqs), width), np.int32)
        for i, s in enumerate(seqs):
            out[i, :len(s)] = s
            mask[i, :len(s)] = 1
        return out, mask

    def decode(self, ids: Sequence[int],
               skip_special: bool = True) -> str:
        toks = []
        special = {self.pad_id, self.cls_id, self.sep_id, self.bos_id,
                   self.enc_id, self.vocab.get(MASK, -1)}
        for i in ids:
            i = int(i)
            if skip_special and i in special:
                continue
            toks.append(self.inv.get(i, UNK))
        text = ""
        for t in toks:
            if t.startswith("##"):
                text += t[2:]
            else:
                text += (" " if text else "") + t
        return text
