"""BPE tokenizer: kernel correctness (pure Python) + Spark parity."""

import json
import random
from collections import Counter

import pytest

from pyontutils_spark.kernel.bpe import (
    BPETokenizer, train_bpe_from_counts, word_histogram, UNK_TOKEN,
    _word_symbols, _pair_counts, _merge_word)


CORPUS = ["low low low low low",
          "lower lower newest newest newest newest newest newest",
          "widest widest widest"]


def _naive_train(word_counts, n_merges, min_pair_count=2):
    """Reference trainer: full pair recount every round (O(V) per merge).

    The production trainer maintains pair counts incrementally; this
    oracle recomputes them from scratch so any drift in the incremental
    bookkeeping shows up as a merge-list mismatch.
    """
    vocab = {}
    base = set()
    for w, n in word_counts.items():
        syms = _word_symbols(w)
        if not syms:
            continue
        vocab[syms] = vocab.get(syms, 0) + int(n)
        base.update(syms)
    merges = []
    for _ in range(n_merges):
        pc = _pair_counts(vocab)
        if not pc:
            break
        pair, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append(pair)
        joined = pair[0] + pair[1]
        nv = {}
        for syms, n in vocab.items():
            new = _merge_word(syms, pair, joined)
            nv[new] = nv.get(new, 0) + n
        vocab = nv
    return merges, sorted(base)


def test_word_histogram():
    assert word_histogram(CORPUS)["newest"] == 6
    assert word_histogram(["", "a  b\ta"]) == Counter({"a": 2, "b": 1})


def test_train_first_merge_is_most_frequent_pair():
    counts = word_histogram(CORPUS)
    tok = train_bpe_from_counts(counts, n_merges=10)
    # 'newest'(6) + 'widest'(3) share ('e','s') and ('s','t▁') at 9 each;
    # tie broken lexicographically -> ('e','s') first
    assert tok.merges[0] == ("e", "s")
    assert tok.merges[1] == ("es", "t▁")


def test_incremental_trainer_matches_naive_recount():
    rng = random.Random(42)
    alphabet = "abcdef"
    for trial in range(25):
        words = {}
        for _ in range(rng.randint(1, 40)):
            w = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 8)))
            words[w] = rng.randint(1, 20)
        n_merges = rng.randint(1, 30)
        tok = train_bpe_from_counts(words, n_merges=n_merges)
        ref_merges, ref_base = _naive_train(words, n_merges)
        assert tok.merges == ref_merges, (trial, words)
        assert tok.base_symbols == ref_base


def test_vectorized_trainer_matches_pure_python_reference():
    """round-7 perf rewrite: the NumPy flat-slot trainer must be
    byte-identical to the retained pure-Python reference, including
    overlapping same-symbol runs, unicode, and empty/degenerate input."""
    from pyontutils_spark.kernel.bpe import train_bpe_from_counts_reference
    rng = random.Random(7)
    for trial in range(40):
        alphabet = "ab" if trial % 3 == 0 else "abcde"
        words = {}
        for _ in range(rng.randint(1, 50)):
            w = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 12)))
            words[w] = words.get(w, 0) + rng.randint(1, 9)
        for nm in (1, 7, 40):
            ref = train_bpe_from_counts_reference(words, n_merges=nm)
            new = train_bpe_from_counts(words, n_merges=nm)
            assert new.merges == ref.merges, (trial, nm, words)
            assert new.vocab == ref.vocab, (trial, nm)
    for counts in ({"aaaa": 3}, {"aaaaa": 2, "aa": 7}, {"abab": 4},
                   {"ababab": 2, "ba": 1}, {"a": 5}, {"": 3, "x": 1},
                   {}, {"naïve": 4, "café": 6, "日本語テスト": 3,
                        "a💡b": 5}):
        for nm in (0, 1, 3, 10):
            ref = train_bpe_from_counts_reference(counts, n_merges=nm)
            new = train_bpe_from_counts(counts, n_merges=nm)
            assert new.merges == ref.merges, (counts, nm)
            assert new.vocab == ref.vocab, (counts, nm)


def test_determinism_under_dict_order():
    counts = dict(word_histogram(CORPUS))
    items = list(counts.items())
    rev = dict(reversed(items))
    a = train_bpe_from_counts(counts, n_merges=20)
    b = train_bpe_from_counts(rev, n_merges=20)
    assert a.merges == b.merges
    assert a.vocab == b.vocab


def test_encode_decode_roundtrip_normalizes_whitespace():
    counts = word_histogram(CORPUS)
    tok = train_bpe_from_counts(counts, n_merges=50)
    text = "newest   lower\t\nwidest low"
    ids = tok.encode(text)
    assert tok.decode(ids) == "newest lower widest low"
    # training words compress to few tokens; 'newest' is fully merged
    assert len(tok.segment_word("newest")) < len("newest")


def test_encode_matches_training_segmentation():
    # the rank-greedy encoder must reproduce training segmentation:
    # replaying the merge list over the word equals segment_word
    counts = word_histogram(CORPUS)
    tok = train_bpe_from_counts(counts, n_merges=50)
    for w in counts:
        syms = _word_symbols(w)
        for m in tok.merges:
            syms = _merge_word(syms, m, m[0] + m[1])
        assert tok.segment_word(w) == syms, w


def test_unknown_symbols_map_to_unk():
    tok = train_bpe_from_counts({"ab": 5}, n_merges=5)
    ids = tok.encode("ab zq")
    assert tok.vocab[UNK_TOKEN] == 0
    assert 0 in ids                      # z / q never seen
    assert tok.decode(tok.encode("ab")) == "ab"


def test_json_roundtrip():
    tok = train_bpe_from_counts(word_histogram(CORPUS), n_merges=30)
    tok2 = BPETokenizer.from_json(tok.to_json())
    assert tok2.merges == tok.merges
    assert tok2.vocab == tok.vocab
    assert tok2.encode("newest lower") == tok.encode("newest lower")
    json.loads(tok.to_json())            # valid JSON payload


def test_empty_and_null_inputs():
    tok = train_bpe_from_counts({}, n_merges=5)
    assert tok.merges == []
    assert tok.encode("") == []
    assert tok.decode([]) == ""


def test_overlapping_pair_merge():
    # 'aaaa' -> (a,a,a,a▁): pair (a,a) self-overlaps; greedy-left merge
    # takes positions 0-1 only, zip-consistent counting on both sides
    tok = train_bpe_from_counts({"aaaa": 10}, n_merges=1)
    assert tok.merges == [("a", "a")]
    assert tok.segment_word("aaaa") == ("aa", "a", "a▁")


# ---------------------------------------------------------------- Spark

@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t) for i, t in enumerate(CORPUS * 7)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_word_counts_matches_kernel_histogram(spark, docs):
    from pyontutils_spark.operators.tokenize import word_counts
    got = {r["word"]: r["count"] for r in word_counts(docs).collect()}
    want = dict(word_histogram(t for (_, t) in
                               ((r["doc_id"], r["text"])
                                for r in docs.collect())))
    assert got == want


def test_word_counts_unicode_whitespace_matches_kernel(spark):
    """ADVICE round 6: Java \\s is ASCII-only by default, so NBSP /
    U+3000 / NEL separated words must still match the kernel's Python
    \\S+ pre-tokenizer — (?U) in the Spark split."""
    from pyontutils_spark.operators.tokenize import word_counts
    texts = ["a\u00a0b\u00a0c", "x\u3000y", "p\u0085qr",
             "plain text"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id int, text string")
    got = {r["word"]: r["count"] for r in word_counts(df).collect()}
    want = dict(word_histogram(texts))
    assert got == want


def test_train_bpe_distributed_equals_local(spark, docs):
    from pyontutils_spark.operators.tokenize import train_bpe
    trained = train_bpe(docs, n_merges=30, min_count=1,
                        max_words=1_000_000)
    local = train_bpe_from_counts(
        word_histogram(r["text"] for r in docs.collect()), n_merges=30)
    assert trained.tokenizer.merges == local.merges
    assert trained.tokenizer.vocab == local.vocab
    assert not trained.truncated
    assert trained.n_words_used == trained.n_distinct_words


def test_train_bpe_truncation_flag(spark, docs):
    from pyontutils_spark.operators.tokenize import train_bpe
    trained = train_bpe(docs, n_merges=5, min_count=1, max_words=2)
    assert trained.truncated
    assert trained.n_words_used == 2
    # the two most frequent words still train a usable model
    assert trained.tokenizer.merges


def test_bpe_encode_parity_with_kernel(spark, docs):
    from pyontutils_spark.operators.tokenize import train_bpe, bpe_encode
    trained = train_bpe(docs, n_merges=30, min_count=1)
    out = bpe_encode(docs, trained.tokenizer).collect()
    tok = trained.tokenizer
    for r in out:
        assert r["token_ids"] == tok.encode(r["text"]), r["text"]
        assert r["n_bpe_tokens"] == len(r["token_ids"])
