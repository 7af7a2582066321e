"""Self-contained byte-pair-encoding tokenizer (F17 exact token counting
without ``transformers``).

The reference counts tokens with a HuggingFace tokenizer
(``apps/cost_estimator_inf.py:53-63``); :func:`instructionspipe_spark.
operators.textstats.token_count_hf` reproduces that when ``transformers``
is installed. This module closes the gap for environments without it: the
classic BPE algorithm (Sennrich et al. 2016 / GPT-2 style rank-ordered
merges — public knowledge) over a word-level pre-tokenizer, with a small
vendored merge table (``bpe_fixture.json``, trained by :func:`train_bpe`
on a corpus written for this repo) so the exact-tokenization code path
executes and is testable everywhere.

Scale shape: the tokenizer is loaded ONCE PER TASK inside an
iterator-form pandas UDF (`operators.textstats.token_count_bpe`),
Arrow-batched — the same execution shape the real-HF path uses, so
swapping in a production merge table changes no plan.
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter

_FIXTURE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bpe_fixture.json")

# BPE-ish pre-tokenizer: words vs runs of non-word-non-space (punctuation).
# Simpler than GPT-2's regex (which needs the third-party `regex` module for
# \p{L}) but the same structure: no token spans whitespace.
_PRETOKEN_RE = re.compile(r"\w+|[^\w\s]+", re.UNICODE)

_EOW = "</w>"  # end-of-word marker so merges can't cross word boundaries


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + _EOW,)


def train_bpe(texts: list[str], num_merges: int) -> list[list[str]]:
    """Learn ``num_merges`` merge rules (most-frequent adjacent symbol pair
    first; ties broken lexicographically for determinism)."""
    vocab: Counter = Counter()
    for t in texts:
        for w in _PRETOKEN_RE.findall(t.lower()):
            vocab[_word_symbols(w)] += 1
    merges: list[list[str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # Deterministic tie-break: highest count, then lexicographically
        # smallest pair.
        (a, b), _n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append([a, b])
        merged = a + b
        new_vocab: Counter = Counter()
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    return merges


class BpeTokenizer:
    """Rank-ordered BPE merges applied greedily (lowest rank first) —
    the GPT-2 merge loop, independent of where the merge table came from."""

    def __init__(self, merges: list[list[str]]):
        self.ranks = {(a, b): i for i, (a, b) in enumerate(merges)}

    @classmethod
    def fixture(cls) -> "BpeTokenizer":
        with open(_FIXTURE_PATH) as f:
            return cls(json.load(f)["merges"])

    def _encode_word(self, word: str) -> list[str]:
        syms = list(_word_symbols(word))
        while len(syms) > 1:
            ranked = [
                (self.ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
                if (a, b) in self.ranks
            ]
            if not ranked:
                break
            _rank, i = min(ranked)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        return syms

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in _PRETOKEN_RE.findall(text.lower()):
            out.extend(self._encode_word(w))
        return out

    def count(self, text: str | None) -> int:
        if not text:
            return 0
        return len(self.encode(text))


# The Spark-side iterator-UDF wrapper lives in operators/textstats.py
# (token_count_bpe) — this module stays driver-side pure Python so the
# functions/ package keeps its no-UDF contract.
