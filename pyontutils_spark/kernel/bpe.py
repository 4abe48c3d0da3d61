"""Byte-pair-encoding tokenizer: pure-Python train/encode/decode core.

Classic corpus-driven BPE (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public algorithm): words
are split into character symbols with an end-of-word marker, and the
most frequent adjacent symbol pair is merged repeatedly until the target
vocabulary size is reached.  Everything here operates on a *word
frequency histogram*, never the corpus itself — that is what makes the
Spark side scale: the executors reduce the corpus to (word, count) pairs
and only the (bounded, min-count/top-N truncated) histogram reaches the
driver, exactly like every production BPE trainer.

Design points (all deterministic, no RNG, no floats):

- Pre-tokenization is ``\\S+`` runs (the engine's whitespace token
  model); words are sequences of *characters* plus the ``_EOW`` marker
  on the last character.  ``decode(encode(text))`` therefore returns the
  text with whitespace runs normalized to single spaces — documented
  and tested, not a surprise.
- Merge selection tie-break is (count DESC, pair lexicographic ASC):
  two histograms with equal content produce identical merge lists no
  matter the dict iteration order.
- Encoding uses the rank-greedy algorithm (repeatedly merge the
  lowest-rank adjacent pair present), which reproduces the training
  segmentation exactly; a per-word cache makes repeated words O(1).
- The model round-trips through JSON (``to_json``/``from_json``) so the
  Spark layer can ship it to executors as a broadcast-sized closure.

The reference repo has no subword tokenizer (its token model is
whitespace + a word regex, pyontutils/core.py); this module is a
beyond-reference capability for the LLM-training-data pipeline family.
"""

from __future__ import annotations

import json
import re
from collections import Counter

__all__ = ["BPETokenizer", "train_bpe_from_counts", "word_histogram",
           "UNK_TOKEN"]

_EOW = "▁"          # end-of-word marker, suffixed to a word's last char
_WORD_RE = re.compile(r"\S+")
UNK_TOKEN = "<unk>"


def word_histogram(texts) -> Counter:
    """Whitespace-run word counts over an iterable of strings."""
    c: Counter = Counter()
    for t in texts:
        if t:
            c.update(_WORD_RE.findall(t))
    return c


def _word_symbols(word: str) -> tuple:
    """Split a word into initial BPE symbols (chars, last one EOW-marked)."""
    if not word:
        return ()
    chars = list(word)
    chars[-1] += _EOW
    return tuple(chars)


def _pair_counts(vocab: dict) -> Counter:
    pc: Counter = Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += n
    return pc


def _merge_word(syms: tuple, pair: tuple, joined: str) -> tuple:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


class BPETokenizer:
    """A trained BPE model: ordered merge list + derived vocab.

    ``vocab`` maps token string -> id.  Ids are assigned
    deterministically: ``<unk>`` = 0, then base symbols sorted
    lexicographically, then merge products in merge order.
    """

    def __init__(self, merges: list, base_symbols: list):
        self.merges = [tuple(m) for m in merges]
        self.base_symbols = list(base_symbols)
        self.ranks = {m: i for i, m in enumerate(self.merges)}
        vocab = {UNK_TOKEN: 0}
        for s in self.base_symbols:
            vocab.setdefault(s, len(vocab))
        for a, b in self.merges:
            vocab.setdefault(a + b, len(vocab))
        self.vocab = vocab
        self.id_to_token = {i: t for t, i in vocab.items()}
        self._cache: dict = {}

    # -- encode / decode -------------------------------------------------
    def segment_word(self, word: str) -> tuple:
        """Rank-greedy BPE segmentation of one word (token strings)."""
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        syms = _word_symbols(word)
        ranks = self.ranks
        while len(syms) > 1:
            best = None
            best_rank = None
            for p in zip(syms, syms[1:]):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = p, r
            if best is None:
                break
            syms = _merge_word(syms, best, best[0] + best[1])
        if len(self._cache) < 250_000:   # bound executor memory
            self._cache[word] = syms
        return syms

    def encode(self, text: str) -> list:
        """Text -> token ids; unknown symbols map to ``<unk>`` (id 0)."""
        if not text:
            return []
        vocab = self.vocab
        out = []
        for w in _WORD_RE.findall(text):
            for s in self.segment_word(w):
                out.append(vocab.get(s, 0))
        return out

    def encode_tokens(self, text: str) -> list:
        """Text -> token strings (debug/inspection form of ``encode``)."""
        if not text:
            return []
        return [s for w in _WORD_RE.findall(text)
                for s in self.segment_word(w)]

    def decode(self, ids) -> str:
        """Token ids -> text with single-space word separation."""
        buf = []
        for i in ids:
            buf.append(self.id_to_token.get(i, UNK_TOKEN))
        return "".join(buf).replace(_EOW, " ").rstrip(" ")

    # -- serialization ----------------------------------------------------
    def to_json(self) -> str:
        return json.dumps({"merges": [list(m) for m in self.merges],
                           "base_symbols": self.base_symbols},
                          ensure_ascii=False)

    @classmethod
    def from_json(cls, payload: str) -> "BPETokenizer":
        d = json.loads(payload)
        return cls(d["merges"], d["base_symbols"])


def train_bpe_from_counts(word_counts: dict, n_merges: int,
                          min_pair_count: int = 2) -> BPETokenizer:
    """Train BPE merges from a (word -> count) histogram.

    Deterministic: merge choice is (count DESC, pair lex ASC); stops
    early when no pair reaches ``min_pair_count``.  Cost is
    O(n_merges * distinct_words_containing_the_pair) via incremental
    pair-count maintenance — fine for histograms up to millions of
    distinct words (the Spark trainer truncates beyond that).
    """
    vocab = {}
    base = set()
    for w, n in word_counts.items():
        syms = _word_symbols(w)
        if not syms:
            continue
        vocab[syms] = vocab.get(syms, 0) + int(n)
        base.update(syms)
    pair_counts = _pair_counts(vocab)
    # which words contain a given pair (incremental update index)
    where: dict = {}
    for syms in vocab:
        for p in zip(syms, syms[1:]):
            where.setdefault(p, set()).add(syms)

    merges = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # deterministic argmax: count desc, then lexicographic pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (pair, cnt) = best
        if cnt < min_pair_count:
            break
        merges.append(pair)
        joined = pair[0] + pair[1]
        for syms in list(where.get(pair, ())):
            n = vocab.pop(syms)
            new = _merge_word(syms, pair, joined)
            # retire old pair contributions, add new ones
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = where.get(p)
                if s is not None:
                    s.discard(syms)
                    if not s:
                        del where[p]
            vocab[new] = vocab.get(new, 0) + n
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + n
                where.setdefault(p, set()).add(new)
    return BPETokenizer(merges, sorted(base))
