"""Training-data operators: dedup family, ANN, text stats, multimodal
plumbing.  Hash parity with DuckDB is asserted here so the driver's
oracle comparisons can rely on it."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pyontutils_spark.operators.dedup import (
    exact_dedup_groups, h32, jaccard_verify, lsh_candidate_pairs,
    simhash, simhash_near_dups, with_minhash)
from pyontutils_spark.operators.multimodal import (
    extract_features, synth_media)
from pyontutils_spark.operators.simsearch import cosine_topk, lsh_topk
from pyontutils_spark.operators.textstats import (
    fingerprint, lang_id, quality_features, token_count)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_h32_matches_duckdb(spark):
    vals = ["abc", "hello world", "x"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.s: r.h for r in df.select("s", h32(F.col("s")).alias("h")).collect()}
    for v in vals:
        want = duckdb.sql(
            f"select ('0x'||substr(md5('{v}'),1,8))::ubigint").fetchone()[0]
        assert got[v] == want


def test_exact_dedup_groups(spark):
    rows = [(1, "same text"), (2, "same text"), (3, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.representative: r.n_dups
           for r in exact_dedup_groups(df).collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_identical_texts_equal_signatures(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "d c b a"), (3, "totally different words")],
        "doc_id long, text string")
    sigs = {r.doc_id: r.minhash for r in with_minhash(df).collect()}
    assert sigs[1] == sigs[2]  # same token set
    assert sigs[1] != sigs[3]
    assert len(sigs[1]) == 16


def test_lsh_candidates_and_jaccard(spark, docs):
    d = docs.limit(200)
    pairs = lsh_candidate_pairs(d, bands=4)
    verified = jaccard_verify(d, pairs, threshold=0.8)
    for r in verified.limit(20).collect():
        assert r.jaccard >= 0.8
    # near-identical docs must be candidates: append a clone
    clone = spark.createDataFrame(
        [(100001, d.select("text").first()[0])], "doc_id long, text string")
    d2 = d.select("doc_id", "text").unionByName(clone)
    first_id = d.select("doc_id").first()[0]
    cand = lsh_candidate_pairs(d2, bands=4)
    hit = cand.filter((F.col("id_a") == first_id)
                      & (F.col("id_b") == 100001)).count()
    assert hit == 1


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon eta"),
         (3, "completely unrelated nonsense phrases here")],
        "doc_id long, text string")
    sigs = {r.doc_id: r.s for r in df.select(
        "doc_id", simhash(F.col("text")).alias("s")).collect()}
    from pyontutils_spark.operators.dedup import hamming64
    d12 = df.sparkSession.createDataFrame(
        [(sigs[1], sigs[2]), (sigs[1], sigs[3])], "a long, b long") \
        .select(hamming64(F.col("a"), F.col("b")).alias("h")).collect()
    assert d12[0].h < d12[1].h  # similar docs closer than dissimilar


def test_simhash_near_dups(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog tonight"),
         (3, "entirely different content with other words only")],
        "doc_id long, text string")
    pairs = {(r.id_a, r.id_b)
             for r in simhash_near_dups(df, max_hamming=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_cosine_topk_exact(spark, emb):
    queries = emb.limit(3).select(F.col("vec_id").alias("q_id"), "embedding")
    out = cosine_topk(queries, emb, k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        # self is its own nearest neighbor
        assert rs[0].vec_id == q and rs[0].cosine == pytest.approx(1.0)
        # ranks strictly ordered by cosine desc
        cos = [r.cosine for r in rs]
        assert cos == sorted(cos, reverse=True)


def test_lsh_topk_recall(spark, emb):
    queries = emb.limit(5).select(F.col("vec_id").alias("q_id"), "embedding")
    exact = cosine_topk(queries, emb, k=5)
    approx = lsh_topk(queries, emb, dim=64, k=5, n_planes=4, n_tables=12)
    e = {(r.q_id, r.vec_id) for r in exact.collect()}
    a = {(r.q_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.75, recall  # 4-plane × 12-table on 64-dim


def test_token_count_and_quality(spark, docs):
    out = quality_features(docs.limit(50)).collect()
    for r in out:
        assert r.n_tokens > 0
        assert 0.0 <= r.quality_score <= 1.0
        assert r.stopword_ratio >= 0.0


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat and the dog is here"),
         (2, "der hund ist nicht mit der katze und das haus"),
         (3, "le chat est dans la maison avec les oiseaux"),
         (4, "xyzzy plugh qwerty")],
        "id long, text string")
    out = {r.id: r.lang for r in df.select(
        "id", lang_id(F.col("text")).alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "some document text"), (2, "some document text"),
         (3, "qqq zzz completely other stuff")],
        "id long, text string")
    fp = {r.id: r.fp for r in df.select(
        "id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_multimodal_image_features_real_decode(spark):
    """synth images are REAL encoded bytes (PPM for even ids, baseline
    JPEG for odd ids); the feature stage decodes the actual bytes (no
    hash fake on this path)."""
    from pyontutils_spark.operators.multimodal import (
        decode_image, image_features)
    media = synth_media(spark, 20)
    mimes = {r.mime for r in media.select("mime").distinct().collect()}
    assert mimes == {"image/x-portable-pixmap", "image/jpeg"}
    feats = extract_features(media).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r.features) == 16
        assert all(0.0 <= x <= 1.0 for x in r.features)
    payload = {r.media_id: bytes(r.payload)
               for r in media.select("media_id", "payload").collect()}
    for r in feats[:5]:
        arr = decode_image(payload[r.media_id])
        assert arr.ndim == 3 and arr.shape[2] == 3
        assert r.features == list(image_features(arr))


def test_multimodal_audio_wav_decode(spark):
    from pyontutils_spark.operators.multimodal import decode_wav
    media = synth_media(spark, 6, kind="audio")
    rows = media.collect()
    assert all(r.duration_ms == 100 for r in rows)
    samples, rate = decode_wav(bytes(rows[0].payload))
    assert rate == 8000 and samples.shape == (800, 1)
    feats = extract_features(media, decoder="audio").collect()
    assert len(feats) == 6
    # distinct frequencies -> distinct zero-crossing rates
    assert len({round(r.features[2], 6) for r in feats}) > 1


def test_multimodal_resize_and_bmp(spark):
    import numpy as np
    import struct
    from pyontutils_spark.operators.multimodal import (
        decode_bmp, decode_image, decode_ppm, encode_ppm, resize_nearest,
        resize_images)
    media = synth_media(spark, 4)
    out = {r.media_id: bytes(r.payload)
           for r in resize_images(media, 8, 8).collect()}
    for p in out.values():
        assert decode_ppm(p).shape == (8, 8, 3)
    # hand-built 2x2 24-bit BMP (bottom-up, row stride padded to 8)
    px_bgr = [b"\x01\x02\x03" + b"\x04\x05\x06" + b"\x00\x00",   # row 0 (bottom)
              b"\x07\x08\x09" + b"\x0a\x0b\x0c" + b"\x00\x00"]  # row 1 (top)
    pixel_data = b"".join(px_bgr)
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                            len(pixel_data), 2835, 2835, 0, 0))
    arr = decode_bmp(header + pixel_data)
    assert arr.shape == (2, 2, 3)
    # top-left pixel is row-1 first pixel, BGR->RGB flipped
    assert arr[0, 0].tolist() == [0x09, 0x08, 0x07]
    assert decode_image(header + pixel_data).tolist() == arr.tolist()


def test_multimodal_decode_stub_for_compressed():
    from pyontutils_spark.kernel.jpeg import encode_jpeg
    from pyontutils_spark.operators.multimodal import decode_image
    import numpy as np
    # baseline JPEG decodes for real now (kernel/jpeg.py); the declared
    # gate is progressive/arithmetic frames (PIL fallback if installed)
    payload = bytearray(encode_jpeg(
        np.zeros((8, 8, 3), dtype="uint8")))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="progressive"):
            decode_image(bytes(payload))
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0JPEG")  # truncated stream
    with pytest.raises(ValueError):
        decode_image(b"GIBBERISH")
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n")  # valid magic, no chunks


def test_png_roundtrip_all_filters():
    """Pure-stdlib PNG: encode known pixels with every scanline filter
    type (None/Sub/Up/Average/Paeth cycled per row), decode, equal."""
    import numpy as np
    from pyontutils_spark.operators.multimodal import (
        decode_image, decode_png, encode_png)
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(10, 7, 3), dtype="uint8")
    for filters in (None, [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        out = decode_png(encode_png(rgb, filters=filters))
        assert np.array_equal(out, rgb), filters
    # RGBA drops alpha; grayscale expands to RGB; dispatch works
    rgba = rng.randint(0, 256, size=(5, 5, 4), dtype="uint8")
    assert np.array_equal(decode_png(encode_png(rgba, [0, 4])),
                          rgba[:, :, :3])
    gray = rng.randint(0, 256, size=(4, 6), dtype="uint8")
    out = decode_image(encode_png(gray, [2, 3]))
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))
    # interlaced PNGs stay declared-unsupported
    import struct as _s
    import zlib as _z
    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    payload = (b"\x89PNG\r\n\x1a\n"
               + _s.pack(">I", len(ihdr)) + b"IHDR" + ihdr
               + _s.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(NotImplementedError):
        decode_png(payload)


def test_ivf_topk_recall_and_full_probe_exact(spark, emb):
    from pyontutils_spark.operators.simsearch import ivf_topk
    queries = emb.limit(5).select(F.col("vec_id").alias("q_id"), "embedding")
    exact = {(r.q_id, r.vec_id) for r in
             cosine_topk(queries, emb, k=5).collect()}
    # nprobe == n_cells degenerates to exhaustive search -> exact result
    full = {(r.q_id, r.vec_id) for r in
            ivf_topk(queries, emb, dim=64, k=5, n_cells=8,
                     nprobe=8).collect()}
    assert full == exact
    # pruned probe keeps most of the true top-k
    approx = {(r.q_id, r.vec_id) for r in
              ivf_topk(queries, emb, dim=64, k=5, n_cells=8,
                       nprobe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall
    # deterministic (seeded kmeans)
    again = {(r.q_id, r.vec_id) for r in
             ivf_topk(queries, emb, dim=64, k=5, n_cells=8,
                      nprobe=3).collect()}
    assert again == approx


def test_cosine_near_dup_pairs(spark):
    from pyontutils_spark.operators.simsearch import cosine_near_dup_pairs
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.999, 0.04, 0.0]),
            (3, [0.0, 1.0, 0.0]), (4, [1.0, 0.001, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r.id_a, r.id_b) for r in
             cosine_near_dup_pairs(df, threshold=0.99).collect()}
    assert (1, 2) in pairs and (1, 4) in pairs and (2, 4) in pairs
    assert all(3 not in p for p in pairs)


def test_ivf_topk_string_query_ids(spark, emb):
    from pyontutils_spark.operators.simsearch import ivf_topk
    queries = emb.limit(3).select(
        F.concat(F.lit("doc:"), F.col("vec_id")).alias("q_id"),
        "embedding")
    out = ivf_topk(queries, emb, dim=64, k=3, n_cells=4, nprobe=4)
    rows = out.collect()
    assert len(rows) == 9
    assert all(r.q_id.startswith("doc:") for r in rows)


def test_minhash_permutations_scramble(spark):
    """Regression: affine coefficients must WRAP the modulus.  With
    small monotone coefficients every permutation picks the same
    minimal token hash, so any two docs sharing the min token get
    identical full signatures regardless of similarity — minhash stops
    estimating Jaccard.  Here two docs share exactly one token (likely
    the min for some but not all permutations): signatures must differ
    in most positions."""
    df = spark.createDataFrame(
        [(1, "shared alpha beta gamma delta"),
         (2, "shared zeta omega theta lambda")],
        "doc_id long, text string")
    sigs = {r.doc_id: r.minhash for r in with_minhash(df).collect()}
    same = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    # true Jaccard = 1/9; expected matching positions ~ k/9 ~ 2 of 16
    assert same <= 6, f"{same}/16 positions equal - monotone permutations?"


def test_minhash_estimates_jaccard(spark):
    """Signature agreement rate ~ true Jaccard (the defining property)."""
    a_toks = [f"w{i}" for i in range(40)]
    b_toks = [f"w{i}" for i in range(20, 60)]  # |A∩B|=20, |A∪B|=60
    df = spark.createDataFrame(
        [(1, " ".join(a_toks)), (2, " ".join(b_toks))],
        "doc_id long, text string")
    sigs = {r.doc_id: r.minhash
            for r in with_minhash(df, k=64).collect()}
    est = sum(a == b for a, b in zip(sigs[1], sigs[2])) / 64.0
    assert abs(est - 20 / 60) < 0.15, est


def test_lsh_blocking_ratio_small_on_distinct_corpus(spark):
    """At the calibrated parametrization (k=16, b=4, r=4, s-curve
    threshold ~0.71) a corpus of genuinely distinct documents yields
    candidates ≪ all-pairs — blocking has not collapsed."""
    from pyontutils_spark.operators.dedup import lsh_blocking_ratio
    rows = [(i, " ".join(f"t{i}x{j}" for j in range(25)))
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ratio = lsh_blocking_ratio(df, k=16, bands=4)
    assert ratio < 0.02, ratio


def test_simhash_band_recall_planted(spark):
    """Full-recall guarantee of the 4-band blocking: EVERY pair at
    hamming <= 3 must surface as a candidate — including pairs whose
    differing bits all fall in the top 8 bits, which the old
    single-prefix (sig >> 24) blocking silently missed."""
    import random

    from pyontutils_spark.operators.dedup import simhash_candidate_pairs
    rnd = random.Random(7)
    masks = []
    # worst cases: all 3 diffs inside ONE band (incl. the old prefix)
    for band in range(4):
        masks.append((1 << (band * 8)) | (1 << (band * 8 + 3))
                     | (1 << (band * 8 + 7)))
    # random <=3-bit masks across the word
    for _ in range(40):
        m = 0
        for b in rnd.sample(range(32), rnd.randint(1, 3)):
            m |= 1 << b
        masks.append(m)
    rows = []
    for i, m in enumerate(masks):
        base = rnd.getrandbits(32)
        rows.append((2 * i, base))
        rows.append((2 * i + 1, base ^ m))
    sig = spark.createDataFrame(rows, "id long, sig long")
    cand = {(r.id_a, r.id_b)
            for r in simhash_candidate_pairs(sig).collect()}
    for i, m in enumerate(masks):
        assert (2 * i, 2 * i + 1) in cand, f"missed pair {i} mask={m:08x}"


def test_simhash_star_edges_component_equivalence(spark, docs):
    """The O(k)-per-block star edges must span exactly the same
    connected components as the O(k²) pairwise candidates — the
    clustering path can then scale where all-pairs cannot (same
    guarantee the MinHash lsh_bucket_star_edges test pins)."""
    from pyontutils_spark.operators.components import (
        connected_components_ids)
    from pyontutils_spark.operators.dedup import (
        simhash_candidate_pairs, simhash_df, simhash_star_edges)
    d = docs.limit(80).select("doc_id", "text")
    sig = simhash_df(d).withColumnRenamed("doc_id", "id")
    pairs = simhash_candidate_pairs(sig) \
        .selectExpr("id_a as u", "id_b as v")
    stars = simhash_star_edges(d)

    def comps(e):
        return {(r.node, r.component)
                for r in connected_components_ids(e).collect()}

    assert comps(pairs) == comps(stars)


def test_simhash_blocking_ratio_small_on_distinct_corpus(spark):
    """Band blocking must not collapse on a distinct corpus: with 4x256
    blocks over random-ish signatures the candidate set stays ≪
    all-pairs, so the hamming verify join cannot go quadratic."""
    from pyontutils_spark.operators.dedup import simhash_blocking_ratio
    rows = [(i, " ".join(f"t{i}x{j}" for j in range(25)))
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ratio = simhash_blocking_ratio(df)
    assert ratio < 0.05, ratio


def test_gopher_quality_flags(spark):
    from pyontutils_spark.operators.textstats import gopher_quality_flags
    rows = [
        (1, "a normal document with reasonably varied wording here"),
        (2, "spam spam spam spam spam spam spam spam spam spam"),
        (3, "too short"),
        (4, "x y z " * 5),  # mean word length 1 -> too low
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in gopher_quality_flags(
        df, min_tokens=4, min_mean_word_len=2.0).collect()}
    assert got[1].keep
    # 'spam spam' bigram repeats 9/9 times -> share 10000
    assert got[2].top_bigram_share_e4 == 10_000 and not got[2].keep
    assert not got[3].keep          # below min_tokens
    assert not got[4].keep          # mean word length 1.0 < 2.0


def test_lsh_star_edges_same_components_as_pairs(spark, docs):
    """The per-bucket star graph must span exactly the same connected
    components as the full pairwise bucket graph (that is the whole
    point: O(k) edges per bucket instead of O(k^2))."""
    from pyontutils_spark.operators.components import \
        connected_components_ids
    from pyontutils_spark.operators.dedup import (
        lsh_bucket_star_edges, lsh_candidate_pairs)
    d = docs.limit(150)
    pairs = lsh_candidate_pairs(d, k=16, bands=4) \
        .selectExpr("id_a AS u", "id_b AS v")
    stars = lsh_bucket_star_edges(d, k=16, bands=4)
    cp = {r.node: r.component
          for r in connected_components_ids(pairs).collect()}
    cs = {r.node: r.component
          for r in connected_components_ids(stars).collect()}
    assert cp == cs and len(cp) > 0
    # and the star edge set is no larger than the pair set
    assert stars.count() <= pairs.count()


def test_gopher_total_on_tiny_docs(spark):
    """The bigram generator must be total under ANSI mode: docs with
    <2 tokens produce an empty index array (no element_at past the
    end), not a crash whenever Catalyst fails to push the n>=2 filter
    below the Generate."""
    from pyontutils_spark.operators.textstats import gopher_quality_flags
    rows = [(1, "one"), (2, ""), (3, "...!!!"), (4, "two tokens")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in gopher_quality_flags(df).collect()}
    assert got[1].n_tokens == 1 and got[1].top_bigram_share_e4 == 0
    assert got[2].n_tokens == 0 and got[3].n_tokens == 0
    assert got[4].top_bigram_share_e4 == 10_000
    assert not any(got[i].keep for i in (1, 2, 3))
