"""Property-based round-trips for the round-6 pure-Python kernels."""

from hypothesis import given, settings, strategies as st

from pyontutils_spark.kernel.bpe import (
    train_bpe_from_counts, word_histogram)
from pyontutils_spark.kernel.encoding import decode_html, sniff_charset
from pyontutils_spark.kernel.flac import decode_flac, encode_flac


_words = st.text(alphabet="abcdef", min_size=1, max_size=6)


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(_words, st.integers(1, 50), max_size=25),
       st.integers(0, 40))
def test_bpe_encode_reproduces_training_words(counts, n_merges):
    tok = train_bpe_from_counts(counts, n_merges=n_merges)
    for w in counts:
        # every training word decodes back exactly
        assert tok.decode(tok.encode(w)) == w
        # segmentation concatenates to the word (+ end marker semantics)
        assert "".join(tok.segment_word(w)).replace("▁", "") == w


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abc \t\n", max_size=30), max_size=8),
       st.integers(0, 30))
def test_bpe_corpus_roundtrip_normalizes_ws(texts, n_merges):
    tok = train_bpe_from_counts(word_histogram(texts), n_merges=n_merges)
    for t in texts:
        want = " ".join(t.split())
        assert tok.decode(tok.encode(t)) == want


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(-(1 << 15), (1 << 15) - 1),
                min_size=1, max_size=600),
       st.sampled_from([1, 2]),
       st.sampled_from([8000, 44100, 48000, 12345]),
       st.sampled_from([256, 333, 4096]))
def test_flac_roundtrip_arbitrary_pcm(mono, nchan, rate, blocksize):
    chans = [mono] * nchan if nchan == 2 else [mono]
    payload = encode_flac(chans, rate, bits_per_sample=16,
                          blocksize=blocksize)
    got, got_rate = decode_flac(payload)
    assert got == chans
    assert got_rate == rate


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=200))
def test_decode_html_utf8_identity(text):
    # any valid-unicode text encoded utf-8 sniffs as utf-8 and survives
    payload = text.encode("utf-8")
    codec = sniff_charset(payload)
    if payload[:3] != b"\xef\xbb\xbf" and "\x00" not in text[:4]:
        if codec == "utf-8":
            assert decode_html(payload) == text


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=300))
def test_decode_html_total_on_garbage(payload):
    # decoding must never raise, whatever bytes arrive
    out = decode_html(payload)
    assert isinstance(out, str)
