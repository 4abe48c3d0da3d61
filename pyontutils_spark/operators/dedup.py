"""Deduplication operators for training-data pipelines.

All hashing uses the *portable hash* ``h32(s) = int(md5(s)[:8], 16)`` so
every signature is reproducible bit-for-bit in the DuckDB oracle
(``('0x' || substr(md5(s),1,8))::ubigint``) — no engine-private hash
functions in any result.

Operators (each JVM-side column expressions; no Python in the hot path):
- exact dedup: group by full-text digest, keep min-id representative
- MinHash signatures (K permutations via (a*h+b) mod p over token h32s)
- LSH banding -> candidate pairs (pairs sharing any band bucket)
- exact n-gram Jaccard verification on candidate pairs
- SimHash (bitwise majority of token hashes)
- embedding cosine near-dup (see simsearch for the ANN path)

Scale notes: signatures are computed per-row with higher-order array
functions (whole-stage codegen, no shuffle); the only shuffles are the
band-bucket groupBy (keys are uniform hashes -> no skew) and the final
pair dedup.  Verification joins fetch token arrays by id — at 100 TB
that join is the cost center, which is why candidates are pruned by
banding first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Modulus for the affine minhash permutations: 2^31-1 (Mersenne).
# The coefficients are ~31-bit (below), so a*h+b wraps the modulus many
# times over (a real scrambling permutation) while the max intermediate
# (2^31-2)*(2^32-1)+2^31 < 2^63-1 still fits a long in BOTH engines —
# no overflow under Spark ANSI or DuckDB bigint.  (A 2^61-1 modulus
# with small a is monotone in h — NOT a permutation: every "min-hash"
# then picks the same minimal token and the signature stops estimating
# Jaccard entirely.)
MERSENNE_P = (1 << 31) - 1


def h32(col) -> Column:
    """Portable 32-bit hash: int(md5(x)[:8], 16).  Reproducible in
    DuckDB as ('0x'||substr(md5(x),1,8))::ubigint."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def tokens_col(text_col) -> Column:
    """Deterministic tokenization: lowercase, non-alnum -> space, split.
    DuckDB mirror: string_split(regexp_replace(lower(x),'[^a-z0-9]+',' ','g'),' ')."""
    cleaned = F.regexp_replace(F.lower(text_col), "[^a-z0-9]+", " ")
    return F.filter(F.split(F.trim(cleaned), " "), lambda t: t != "")


def _minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic affine coefficients (documented constants, the
    oracle SQL interpolates the same numbers as literals): a_i, b_i are
    the first 8 hex digits of md5("minhash-a-i"/"minhash-b-i") reduced
    into [1, p) — pseudorandom ~31-bit values, so every permutation
    wraps the modulus and genuinely scrambles the token-hash order."""
    import hashlib

    def coeff(tag: str, i: int) -> int:
        d = hashlib.md5(f"minhash-{tag}-{i}".encode()).hexdigest()
        return int(d[:8], 16) % (MERSENNE_P - 1) + 1

    return [(coeff("a", i), coeff("b", i)) for i in range(k)]


def _affine(a: int, b: int):
    # closure factory: pyspark inspects lambda arity, so default-arg
    # capture (lambda h, a=a: ...) would be read as a 2/3-arg lambda
    return lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE_P


def minhash_signature(text_col, k: int = 16) -> Column:
    """array<long> of K min-hashes over the distinct token set."""
    hashes = F.array_distinct(F.transform(tokens_col(text_col), h32))
    sigs = [F.array_min(F.transform(hashes, _affine(a, b)))
            for a, b in _minhash_params(k)]
    return F.array(*sigs)


def with_minhash(docs: DataFrame, text_col: str = "text",
                 k: int = 16, out: str = "minhash") -> DataFrame:
    return docs.withColumn(out, minhash_signature(F.col(text_col), k))


def _exploded_token_hashes(docs: DataFrame, id_col: str,
                           text_col: str) -> DataFrame:
    return docs.select(
        id_col,
        F.explode(F.array_distinct(
            F.transform(tokens_col(F.col(text_col)), h32))).alias("h"))


def minhash_df(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", k: int = 16,
               out: str = "minhash") -> DataFrame:
    """(id, minhash array<long>) via explode + ONE hash-aggregate with K
    min() functions — ~10x faster than K per-row higher-order-function
    passes (which Spark evaluates interpreted per element).  Same values
    as ``minhash_signature``.  Documents with an empty token set drop
    out (none exist in real corpora; the column variant keeps them)."""
    ex = _exploded_token_hashes(docs, id_col, text_col)
    aggs = [F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE_P)
            .alias(f"_m{i}")
            for i, (a, b) in enumerate(_minhash_params(k))]
    return (ex.groupBy(id_col).agg(*aggs)
            .select(id_col, F.array(*[f"_m{i}" for i in range(k)])
                    .alias(out)))


def simhash_df(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", bits: int = 32,
               out: str = "sig") -> DataFrame:
    """(id, sig long) SimHash via explode + ONE hash-aggregate with
    ``bits`` sums (bit j set iff sum over tokens of (bit_j*2-1) > 0 —
    identical majority rule to ``simhash``)."""
    ex = _exploded_token_hashes(docs, id_col, text_col)
    aggs = [F.sum(F.shiftright("h", j) % 2 * 2 - 1).alias(f"_b{j}")
            for j in range(bits)]
    votes = ex.groupBy(id_col).agg(*aggs)
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"_b{j}") > 0,
                      F.lit(1 << j).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return votes.select(id_col, sig.alias(out))


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(digest, representative = min id, n_dups).  Hash-groupBy dedup;
    map-side partial aggregation keeps the shuffle tiny."""
    return (docs.select(F.md5(F.col(text_col)).alias("digest"),
                        F.col(id_col))
            .groupBy("digest")
            .agg(F.min(id_col).alias("representative"),
                 F.count("*").alias("n_dups")))


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 16,
                        bands: int = 4) -> DataFrame:
    """MinHash-LSH candidate pairs: ids sharing at least one band bucket.
    Deterministic (not sampled), so the oracle can reproduce it exactly.
    k must be divisible by bands.

    Calibration: the s-curve similarity threshold is
    ``(1/bands) ** (bands/k)`` — at the default k=16, bands=4 (r=4 rows
    per band) that is ~0.71, i.e. pairs well below ~0.7 Jaccard rarely
    collide.  Small r (e.g. r=2) drags the threshold toward 0.5 and the
    candidate set toward all-pairs — check ``lsh_blocking_ratio`` when
    tuning; a ratio near 1 means blocking has collapsed and the verify
    join will scale quadratically."""
    assert k % bands == 0
    r = k // bands
    sig = minhash_df(docs.select(id_col, text_col), id_col, text_col, k)
    buckets = None
    for b in range(bands):
        band = (sig.select(
            F.col(id_col).alias("id"),
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *[
                F.element_at("minhash", b * r + j + 1).cast("string")
                for j in range(r)])).alias("bucket")))
        buckets = band if buckets is None else buckets.unionByName(band)
    a = buckets.select("band", "bucket", F.col("id").alias("id_a"))
    bb = buckets.select("band", "bucket", F.col("id").alias("id_b"))
    return (a.join(bb, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def lsh_bucket_star_edges(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 16,
                          bands: int = 4) -> DataFrame:
    """Candidate edges for near-dup CLUSTERING at 100-TB scale: instead
    of all O(k²) pairs per band bucket (``lsh_candidate_pairs`` — right
    for pairwise verify, quadratic for a dup-heavy corpus), emit one
    STAR per bucket: every member connects to the bucket's min id —
    O(k) edges per bucket, and the star spans exactly the same
    connected components as the full pairwise bucket graph.  Feed the
    result to ``components.connected_components_ids`` (optionally
    Jaccard-verifying the star edges first; note verification on star
    edges alone can split a true clique whose min-member happens to be
    the outlier — verify-then-cluster on stars is a recall/cost knob,
    documented, while cluster-then-verify keeps exact bucket
    connectivity).  Returns (u, v) with u = bucket min, v = member."""
    assert k % bands == 0
    r = k // bands
    sig = minhash_df(docs.select(id_col, text_col), id_col, text_col, k)
    buckets = None
    for b in range(bands):
        band = (sig.select(
            F.col(id_col).alias("id"),
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *[
                F.element_at("minhash", b * r + j + 1).cast("string")
                for j in range(r)])).alias("bucket")))
        buckets = band if buckets is None else buckets.unionByName(band)
    # agg + equi-join rather than collect_set: a pathological bucket
    # with 10^6 members must not materialize as one array row
    mins = buckets.groupBy("band", "bucket").agg(F.min("id").alias("u"))
    return (buckets.join(mins, ["band", "bucket"])
            .select("u", F.col("id").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def lsh_blocking_ratio(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 16,
                       bands: int = 4) -> float:
    """Diagnostic: |candidate pairs| / |all pairs| for a given LSH
    parametrization on a (sampled) corpus.  Run this on a sample when
    calibrating — silent blocking collapse (ratio -> 1) means the
    banding keeps nearly everything and the downstream verify join
    would explode quadratically at scale."""
    n = docs.count()
    all_pairs = n * (n - 1) // 2
    if all_pairs == 0:
        return 0.0
    cand = lsh_candidate_pairs(docs, id_col, text_col, k, bands).count()
    return cand / all_pairs


def simhash_blocking_ratio(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", bits: int = 32,
                           n_bands: int = 4) -> float:
    """Diagnostic twin of ``lsh_blocking_ratio`` for the SimHash band
    blocking: |candidate pairs| / |all pairs|.  Near 1 means the bands
    keep nearly everything (signature collapse — e.g. a boilerplate-
    dominated corpus) and the hamming verify would go quadratic."""
    n = docs.count()
    all_pairs = n * (n - 1) // 2
    if all_pairs == 0:
        return 0.0
    sig = simhash_df(docs.select(id_col, text_col), id_col, text_col,
                     bits).withColumnRenamed(id_col, "id")
    cand = simhash_candidate_pairs(sig, bits, n_bands).count()
    return cand / all_pairs


def jaccard_verify(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   threshold: float = 0.0) -> DataFrame:
    """Exact token-set Jaccard on candidate pairs.
    jaccard = |A ∩ B| / |A ∪ B| over distinct token sets."""
    toks = docs.select(F.col(id_col).alias("id"),
                       F.array_distinct(tokens_col(F.col(text_col)))
                       .alias("toks"))
    out = (pairs
           .join(toks.withColumnRenamed("id", "id_a")
                 .withColumnRenamed("toks", "toks_a"), "id_a")
           .join(toks.withColumnRenamed("id", "id_b")
                 .withColumnRenamed("toks", "toks_b"), "id_b")
           .withColumn("inter", F.size(F.array_intersect("toks_a", "toks_b")))
           .withColumn("uni", F.size(F.array_union("toks_a", "toks_b")))
           .withColumn("jaccard", F.col("inter") / F.col("uni"))
           .select("id_a", "id_b", "jaccard"))
    return out.filter(F.col("jaccard") >= threshold)


def ngram_shingles(text_col, n: int = 5) -> Column:
    """Character n-gram shingle hash set (rolling window via sequence +
    substring — pure column expressions)."""
    t = F.lower(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - n + 1, F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: h32(t.substr(i, F.lit(n)))))


def simhash(text_col, bits: int = 32) -> Column:
    """SimHash over token h32s: bit j of the signature is the majority
    vote of bit j across token hashes.  Pure per-row expression."""
    hashes = F.array_distinct(F.transform(tokens_col(text_col), h32))
    n = F.size(hashes)
    acc = F.lit(0).cast("long")

    def bit_is_one(j: int):
        return lambda h: F.shiftright(h, j) % 2 == 1

    for j in range(bits):
        ones = F.size(F.filter(hashes, bit_is_one(j)))
        acc = acc + F.when(ones * 2 > n, F.lit(1 << j).cast("long")) \
                     .otherwise(F.lit(0).cast("long"))
    return acc


def hamming64(a, b) -> Column:
    """Hamming distance between two long signatures (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidate_pairs(sig: DataFrame, bits: int = 32,
                            n_bands: int = 4) -> DataFrame:
    """Candidate (id_a, id_b) pairs from a ``(id, sig)`` SimHash table by
    blocking on EACH of ``n_bands`` disjoint ``bits/n_bands``-bit bands
    (the Manku/Jain/Sarma rotated-table scheme as a band union — the
    same id-only bucket-join shape as ``lsh_candidate_pairs``).

    Recall guarantee (pigeonhole): any pair with hamming distance
    <= n_bands - 1 differs in at most n_bands - 1 bands, so at least
    one band is IDENTICAL and the pair collides there.  The default
    4 bands over 32 bits therefore finds EVERY hamming<=3 pair — the
    old single-8-bit-prefix blocking silently missed pairs whose
    differing bit fell inside the prefix.

    Scale: block cardinality is n_bands * 2^(bits/n_bands) (4 * 2^8 =
    1024 blocks at the defaults, 4x the prefix scheme), and block sizes
    stay bounded by the per-band value distribution rather than one
    fixed 256-way split — the within-block self-join is the only
    quadratic term and it is per-bucket, exactly like MinHash-LSH."""
    banded = _simhash_banded(sig, bits, n_bands)
    a = banded.select("band", "blk", F.col("id").alias("id_a"))
    b = banded.select("band", "blk", F.col("id").alias("id_b"))
    return (a.join(b, ["band", "blk"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def _simhash_banded(sig: DataFrame, bits: int, n_bands: int) -> DataFrame:
    """(id, band, blk) rows: one row per disjoint signature band."""
    assert bits % n_bands == 0
    bw = bits // n_bands
    mask = (1 << bw) - 1
    return sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright("sig", i * bw).bitwiseAND(F.lit(mask))
                     .alias("blk"))
            for i in range(n_bands)])).alias("bb")) \
        .select("id", "bb.band", "bb.blk")


def simhash_star_edges(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", bits: int = 32,
                       n_bands: int = 4) -> DataFrame:
    """Candidate edges for SimHash near-dup CLUSTERING at corpus scale:
    one STAR per (band, block) — every member connects to the block's
    min id, O(k) edges per block instead of ``simhash_candidate_pairs``'
    O(k²), spanning exactly the same connected components (the
    ``lsh_bucket_star_edges`` shape, same hub-safe agg+join block min —
    no block's member set is ever materialized in one row).  Feed to
    ``components.connected_components_ids``; the same verify-then-
    cluster vs cluster-then-verify recall/cost tradeoff documented on
    the MinHash star applies."""
    sig = simhash_df(docs.select(id_col, text_col), id_col, text_col,
                     bits).withColumnRenamed(id_col, "id")
    banded = _simhash_banded(sig, bits, n_bands)
    mins = banded.groupBy("band", "blk").agg(F.min("id").alias("u"))
    return (banded.join(mins, ["band", "blk"])
            .select("u", F.col("id").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def simhash_near_dups(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3,
                      bits: int = 32, n_bands: int = 4) -> DataFrame:
    """Near-dup pairs by SimHash: block on ``n_bands`` disjoint bands of
    the signature (``simhash_candidate_pairs`` — full recall for
    hamming <= n_bands - 1), then verify hamming <= max_hamming on the
    candidates.  With the defaults (4 bands, max_hamming=3) the result
    is EXACTLY the set of all pairs at hamming <= 3, computed without
    an all-pairs join.  A ``max_hamming`` ABOVE n_bands - 1 is
    best-effort (pairs differing in every band are missed) — raise
    ``n_bands`` (and keep bits % n_bands == 0) to extend the exact
    radius."""
    sig = simhash_df(docs.select(id_col, text_col), id_col, text_col,
                     bits).withColumnRenamed(id_col, "id")
    cand = simhash_candidate_pairs(sig, bits, n_bands)
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (cand.join(sa, "id_a").join(sb, "id_b")
            .withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
