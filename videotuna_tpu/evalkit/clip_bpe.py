"""OpenAI-CLIP byte-pair-encoding tokenizer (pure Python).

The VBench ViCLIP dimensions tokenize prompts with CLIP's BPE
(reference: /root/reference/eval/vbench/third_party/ViCLIP/simple_tokenizer.py:78-159).
This is a from-the-algorithm reimplementation of that tokenizer: byte→
unicode remapping, greedy lowest-rank pair merging over the public
``bpe_simple_vocab_16e6.txt.gz`` merge table, the CLIP word-split regex,
and <|startoftext|>/<|endoftext|> specials.

The reference cleans text with ``ftfy.fix_text`` + ``html.unescape``;
ftfy is not in this environment, so we apply ``html.unescape`` twice and
NFC normalization — identical behaviour for all well-formed (non-mojibake)
prompts, which is what VBench's prompt lists contain.

The merge-table asset is pure data (the public OpenAI CLIP vocabulary);
``find_vocab_asset`` locates a copy if one exists on disk.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import regex as _re
except ImportError:  # pragma: no cover - regex is in the base image
    import re as _re

# CLIP's word-splitting pattern: specials, contractions, letter runs,
# digit singles, other-symbol runs; case-insensitive.
_WORD_RE = None

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"

_VOCAB_CANDIDATES = (
    os.path.join(os.path.dirname(__file__), "assets",
                 "bpe_simple_vocab_16e6.txt.gz"),
    "/root/reference/tools/data_process/caption/llava/model/"
    "multimodal_encoder/dev_eva_clip/eva_clip/bpe_simple_vocab_16e6.txt.gz",
)


def find_vocab_asset() -> Optional[str]:
    """Locate a bpe_simple_vocab_16e6.txt.gz on disk, if any."""
    for cand in _VOCAB_CANDIDATES:
        if os.path.exists(cand):
            return cand
    return None


@functools.lru_cache()
def _byte_unicode_table() -> Dict[int, str]:
    """Invertible byte→printable-unicode map (GPT-2/CLIP convention):
    printable latin bytes map to themselves, the rest to 256+k."""
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(ord("\xa1"), ord("\xac") + 1))
            + list(range(ord("\xae"), ord("\xff") + 1)))
    table = {b: chr(b) for b in keep}
    extra = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + extra)
            extra += 1
    return table


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = unicodedata.normalize("NFC", text)
    text = " ".join(text.split())
    return text.strip().lower()


class ClipBPE:
    """Greedy BPE over the CLIP merge table.

    vocab layout (49408 entries): 256 byte symbols, 256 byte symbols with
    ``</w>``, 48894 merged tokens, then the two specials.
    """

    def __init__(self, vocab_path: str):
        table = _byte_unicode_table()
        self.byte_encoder = table
        merges: List[Tuple[str, str]] = []
        with gzip.open(vocab_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # line 0 is a header; the CLIP table keeps 49152-256-2 merges
        for line in lines[1:49152 - 256 - 2 + 1]:
            a, _, b = line.partition(" ")
            merges.append((a, b))
        symbols = list(table.values())
        vocab = symbols + [s + "</w>" for s in symbols]
        vocab += ["".join(m) for m in merges]
        vocab += [SOT, EOT]
        self.encoder: Dict[str, int] = {tok: i for i, tok in
                                        enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.ranks: Dict[Tuple[str, str], int] = {m: i for i, m in
                                                  enumerate(merges)}
        self.sot_id = self.encoder[SOT]
        self.eot_id = self.encoder[EOT]
        global _WORD_RE
        if _WORD_RE is None:
            _WORD_RE = _re.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
                r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
                if _re.__name__ == "regex" else
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
                r"|[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]+",
                _re.IGNORECASE)
        self._cache: Dict[str, List[str]] = {}

    def _bpe(self, word: str) -> List[str]:
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        parts = list(word[:-1]) + [word[-1] + "</w>"]
        while len(parts) > 1:
            pairs = [(self.ranks.get((parts[i], parts[i + 1]),
                                     float("inf")), i)
                     for i in range(len(parts) - 1)]
            best_rank, _ = min(pairs)
            if best_rank == float("inf"):
                break
            first, second = None, None
            for rank, i in pairs:
                if rank == best_rank:
                    first, second = parts[i], parts[i + 1]
                    break
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if (i < len(parts) - 1 and parts[i] == first
                        and parts[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        self._cache[word] = parts
        return parts

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for word in _WORD_RE.findall(_clean(text)):
            word = "".join(self.byte_encoder[b]
                           for b in word.encode("utf-8"))
            ids.extend(self.encoder[tok] for tok in self._bpe(word))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        inv = {v: k for k, v in self.byte_encoder.items()}
        raw = bytearray()
        i = 0
        while i < len(text):
            if text.startswith("</w>", i):
                raw.append(ord(" "))
                i += 4
            else:
                raw.append(inv.get(text[i], ord("?")))
                i += 1
        return raw.decode("utf-8", errors="replace").strip()

    def __call__(self, texts, context: int = 77,
                 truncate: bool = True) -> np.ndarray:
        """Batch-tokenize to a fixed (B, context) int array, CLIP
        protocol: sot + tokens + eot, zero padding."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context), np.int64)
        for i, t in enumerate(texts):
            ids = [self.sot_id] + self.encode(t) + [self.eot_id]
            if len(ids) > context:
                if not truncate:
                    raise ValueError(f"prompt too long: {t!r}")
                ids = ids[:context]
                ids[-1] = self.eot_id
            out[i, :len(ids)] = ids
        return out


@functools.lru_cache()
def default_tokenizer() -> Optional[ClipBPE]:
    path = find_vocab_asset()
    return ClipBPE(path) if path is not None else None
