"""Similarity search over embedding columns (SURVEY.md §2.10
``llm_sim_search``).

Two tiers:

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus; dot products via ``zip_with`` +
  ``aggregate`` (strictly sequential fold → bit-reproducible), top-k
  per query via a per-partition heap pattern (window rank ≤ k after
  AQE-coalesced shuffle on query_id). Cost O(|Q|·N) — the correctness
  baseline and perfectly fine when |Q| is small.
* ``ivf_topk`` — IVF-style partitioned search: k-means-lite centroid
  table (deterministic seed), every corpus vector assigned to its
  nearest centroid once (one narrow pass), queries probe only the
  ``n_probe`` nearest centroids → cost O(|Q|·N·n_probe/C). The index
  (assignments) is a DataFrame you persist and reuse — at 100 TB this
  is the difference between a full scan and touching ~n_probe/C of it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window, functions as F


@dataclass
class LshIndex:
    """Prebuilt SRP-LSH bucket index + the build parameters it is only
    valid under. ``lsh_topk`` re-derives each table's hyperplanes from
    ``(n_planes, seed_base + table_position)``, so an index persisted
    with different parameters or reloaded out of table order would
    silently shrink candidate overlap to near self-hits — carrying the
    parameters with the tables lets ``lsh_topk`` enforce the contract
    instead of documenting it. Persist each table under its position
    (e.g. ``.../table_000``) and reconstruct with the same parameters.
    """

    tables: list[DataFrame]
    n_planes: int = 8
    seed_base: int = 42
    # True only for indexes reloaded from a persisted bucket-
    # partitioned layout (load_lsh_index sets it): static touched-
    # bucket pruning can only cut FILE reads, so lsh_topk's auto
    # default prunes exactly when this is set — an in-memory index has
    # no scan to prune and the probe-code collect would be pure cost.
    reloaded: bool = False
    # Bucket-GROUP partitioning shift of the persisted layout (None =
    # legacy one-directory-per-bucket layout, or an in-memory index).
    # When set, the on-disk tables are partitioned by
    # ``__bgrp = __bucket >> bgrp_shift`` and sorted by ``__bucket``
    # within files, so probe pruning is two-level: directory pruning on
    # the probed GROUPS plus parquet row-group/file pruning on the
    # probed buckets (save_lsh_index explains the file-count math).
    bgrp_shift: int | None = None

    def __post_init__(self) -> None:
        if not self.tables:
            raise ValueError(
                "LshIndex: need at least one bucket table (did a glob "
                "over the persisted index directory match nothing?)"
            )

    @property
    def n_tables(self) -> int:
        return len(self.tables)


@dataclass
class IvfIndex:
    """Prebuilt IVF index: centroid table + inverted-list assignments,
    plus the centroid count fixed at build time — so ``ivf_topk`` can
    size its probe default without running a ``count()`` job per query
    batch. Unpacks as ``(centroids, assignments)`` for compatibility."""

    centroids: DataFrame
    assignments: DataFrame
    n_centroids: int
    # see LshIndex.reloaded — set by load_ivf_index, gates ivf_topk's
    # auto static-prune (file-backed assignments only)
    reloaded: bool = False

    def __iter__(self):
        return iter((self.centroids, self.assignments))


def dot_expr(a: str | Column, b: str | Column) -> Column:
    """Sequential-fold dot product in float64 — deterministic order."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca.cast("array<double>"), cb.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: str | Column) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(ca.cast("array<double>"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def drop_null_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """NULL-or-EMPTY-vector contract (round-11 adversarial sweeps): a
    row with a NULL or zero-length embedding is unsearchable and
    unindexable — zip/dot against it is undefined (DuckDB's
    list_zip(NULL, v) yields an empty list and list_reduce then
    ERRORS; Spark's KMeans .fit and the SRP bucket UDF's np.stack
    crash outright on NULL/ragged shapes). Every vector operator
    drops such rows at ingestion; the oracles mirror with
    ``embedding IS NOT NULL AND len(embedding) > 0``."""
    return df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    key: str = "vec_id",
    vec_col: str = "embedding",
    query_key: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is broadcast (small by contract); the scored cross
    product never materializes — Catalyst pipelines scan → score →
    window-rank, and the rank filter keeps k rows per query.
    Deterministic tie-break: (score desc, vec_id asc).
    """
    q = F.broadcast(
        drop_null_vectors(queries, vec_col).select(
            F.col(query_key), F.col(vec_col).alias("__qvec")
        )
    )
    scored = drop_null_vectors(corpus, vec_col).select(
        key, vec_col
    ).crossJoin(q).select(
        query_key,
        key,
        cosine_expr(vec_col, "__qvec").alias("cosine"),
    )
    w = Window.partitionBy(query_key).orderBy(F.col("cosine").desc(), F.col(key).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _centroids(
    corpus: DataFrame,
    key: str,
    vec_col: str,
    n_centroids: int,
    max_iter: int = 5,
    init_mode: str = "k-means||",
) -> DataFrame:
    """Seeded ``ml.clustering.KMeans`` centroids (k-means|| init, a few
    Lloyd iterations): genuine cluster structure, which the probe
    pruning depends on — the earlier one-pass hash-seeded averaging
    produced near-identical centroids on uniform data and recall@10
    suffered (0.52). Training is fully distributed (block matrices);
    the k×dim center table collects to the driver — tiny by design,
    it is broadcast right back out as the probe table."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = drop_null_vectors(corpus, vec_col).select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    ).cache()  # Lloyd iterations re-scan the features; pay the read once
    try:
        model = KMeans(
            k=n_centroids,
            maxIter=max_iter,
            seed=42,
            featuresCol="features",
            initMode=init_mode,
        ).fit(feats)
    finally:
        feats.unpersist(blocking=False)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return corpus.sparkSession.createDataFrame(
        rows, "centroid_id int, centroid array<double>"
    )


def suggest_ivf_params(n_vectors: int, probe_fraction: float = 5 / 16) -> tuple[int, int]:
    """Index sizing for :func:`build_ivf_index`: ``(n_centroids,
    n_probe)`` with centroids ~ √n (cell size ~ √n balances the
    per-query centroid scan against the probed-list scan) and probes
    holding ``probe_fraction`` of cells.

    This rule is load-bearing, not cosmetic: the 10× corpus rehearsal
    (tools/scale_rehearsal.py) measured recall@10 degrading 0.72 → 0.56
    when the centroid count was left FIXED while the corpus grew —
    with √n sizing recall stays flat (0.82/0.70/0.74 at 1×/3×/10× on
    the near-uniform worst-case fixture)."""
    n_centroids = max(16, int(round(n_vectors ** 0.5)))
    return n_centroids, max(5, round(n_centroids * probe_fraction))


def build_ivf_index(
    corpus: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    max_iter: int = 5,
    init_mode: str = "k-means||",
) -> IvfIndex:
    """Assign every vector to its nearest centroid (the IVF inverted
    lists). Returns an :class:`IvfIndex` (unpacks as ``(centroids,
    assignments)``); persist the assignments table partitioned by
    centroid_id for reuse.

    ``max_iter``/``init_mode`` tune the Lloyd budget. The defaults
    (k-means||, 5 iterations) are the probe-recall posture every ANN
    caller keeps — recall depends on centroid quality there. SemDeDup
    passes a cheaper budget: its candidates are verified with exact
    cosine (no false pairs ever) and exactly-identical embeddings
    share a cosine-argmax cell under ANY centroid set, so those are
    always found; for every other near-dup pair (non-parallel, or
    scaled copies — the projection is mean-centered), within-cell
    candidate generation is an approximation under any budget, and
    the measured recall of the cheap and default budgets is
    equivalent (round 14, tests/test_llm_ops.py::
    TestSemdedupClusterBudget)."""
    corpus = drop_null_vectors(corpus, vec_col)
    cents = _centroids(
        corpus, key, vec_col, n_centroids, max_iter=max_iter, init_mode=init_mode
    )
    c = F.broadcast(cents.select("centroid_id", "centroid"))
    scored = corpus.select(key, vec_col).crossJoin(c).select(
        key,
        vec_col,
        "centroid_id",
        cosine_expr(vec_col, "centroid").alias("__sim"),
    )
    w = Window.partitionBy(key).orderBy(F.col("__sim").desc(), F.col("centroid_id"))
    assign = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key, vec_col, "centroid_id")
    )
    return IvfIndex(cents, assign, n_centroids)


def build_lsh_index(
    corpus: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    seed_base: int = 42,
) -> LshIndex:
    """Per-table SRP bucket assignments: ``n_tables`` DataFrames of
    (key, __bucket) — the persistable LSH index, returned as an
    :class:`LshIndex` that carries the build parameters. Build once
    (seeded planes, so rebuilds are stable), persist each table
    partitioned by ``__bucket`` under its position, and pass to
    :func:`lsh_topk` via ``index=`` so each query batch pays probe
    cost only."""
    from steam_data_pipeline_spark.llm.dedup import _srp_bucket_udf

    vecs = drop_null_vectors(corpus, vec_col).select(key, vec_col)
    tables = [
        vecs.withColumn(
            "__bucket",
            _srp_bucket_udf(n_planes, seed=seed_base + table)(F.col(vec_col)),
        ).select(key, "__bucket")
        for table in range(n_tables)
    ]
    return LshIndex(tables, n_planes=n_planes, seed_base=seed_base)


def save_lsh_index(
    index: LshIndex, path: str, bucket_group_shift: int | None = None
) -> None:
    """Persist an LSH index WITH its build parameters — the durable
    form of the :class:`LshIndex` contract. Layout::

        <path>/_params            1-row parquet (n_planes, seed_base,
                                  n_tables, bgrp_shift)
        <path>/table_000/...      bucket assignments, partitioned by
                                  __bgrp = __bucket >> bgrp_shift and
                                  SORTED by __bucket within files

    Everything is written through Spark (object-store safe, no driver-
    local filesystem assumptions).

    Partition granularity: one directory PER BUCKET (the pre-r13
    layout) makes probe pruning trivial but pays 2^n_planes directory
    listings + one tiny file per bucket per table on every reload —
    measured 2.6 s of the 2.7 s persisted-probe leg at sf0.1 (256
    dirs x 2 tables over 3 MB of data/table) was discovery + per-file
    open cost, and object stores at 100 TB charge the same way. So
    buckets are grouped: ``bgrp_shift`` (default: n_planes - 5, i.e.
    32 directories/table) coarsens the partition key while each file
    stays SORTED by ``__bucket`` — ``lsh_topk``'s probe then prunes
    directories on the probed GROUP set and parquet min/max stats
    prune row groups/files on the probed bucket IN predicate, so the
    probed-fraction read survives at near-bucket granularity with
    ~2^bgrp_shift fewer files (measured 2.63 -> 1.12 s on the probe
    scan at sf0.1, identical rows). ``bucket_group_shift=0`` keeps
    one-directory-per-bucket semantics (files still carry __bucket).
    The shift travels in ``_params``, so readers never guess it.
    """
    if bucket_group_shift is None:
        bucket_group_shift = max(0, index.n_planes - 5)
    spark = index.tables[0].sparkSession
    spark.createDataFrame(
        [(index.n_planes, index.seed_base, index.n_tables, bucket_group_shift)],
        "n_planes int, seed_base int, n_tables int, bgrp_shift int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_params")
    for i, t in enumerate(index.tables):
        # cluster rows by group BEFORE the partitioned write — without
        # this every write task opens up to 2^(n_planes - shift)
        # partition writers and the dynamic-partition sort dominates
        # (same fix measured 65s -> 8s on the dedup signature index,
        # llm/dedup.py); the within-partition sort by __bucket is what
        # makes parquet stats prune at bucket granularity on reload
        (
            t.withColumn(
                "__bgrp", F.shiftright(F.col("__bucket"), bucket_group_shift)
            )
            .repartition(F.col("__bgrp"))
            .sortWithinPartitions("__bucket")
            .write.mode("overwrite")
            .partitionBy("__bgrp")
            .parquet(f"{path}/table_{i:03d}")
        )


def load_lsh_index(spark, path: str) -> LshIndex:
    """Reload a persisted LSH index; the build parameters travel with
    it, so ``lsh_topk`` probes with the exact planes the buckets were
    built under — the mismatch/out-of-order failure mode ADVICE r4
    flagged cannot occur through this path. Indexes written before the
    bucket-group layout (no ``bgrp_shift`` in ``_params``) load with
    ``bgrp_shift=None`` and probe with the legacy per-bucket
    partition filter."""
    p = spark.read.parquet(f"{path}/_params").first()
    shift = p.bgrp_shift if "bgrp_shift" in p.__fields__ else None
    tables = [
        spark.read.parquet(f"{path}/table_{i:03d}") for i in range(p.n_tables)
    ]
    return LshIndex(
        tables,
        n_planes=p.n_planes,
        seed_base=p.seed_base,
        reloaded=True,
        bgrp_shift=shift,
    )


def save_ivf_index(index: IvfIndex, path: str) -> None:
    """Persist an IVF index: tiny centroid table, assignments
    partitioned by ``centroid_id`` (the inverted lists become
    partition directories, so probing a reloaded index prunes to the
    probed lists at the scan — no full index read per query batch),
    and the build parameters."""
    spark = index.centroids.sparkSession
    spark.createDataFrame(
        [(index.n_centroids,)], "n_centroids int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_params")
    index.centroids.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )
    # cluster by list before the partitioned write (see save_lsh_index)
    index.assignments.repartition(F.col("centroid_id")).write.mode(
        "overwrite"
    ).partitionBy("centroid_id").parquet(f"{path}/assignments")


def load_ivf_index(spark, path: str) -> IvfIndex:
    """Reload a persisted IVF index; carries its centroid count, so
    ``ivf_topk``'s probe-fraction default needs no ``count()`` job."""
    p = spark.read.parquet(f"{path}/_params").first()
    return IvfIndex(
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/assignments"),
        p.n_centroids,
        reloaded=True,
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    key: str = "vec_id",
    vec_col: str = "embedding",
    query_key: str = "query_id",
    n_planes: int | None = None,
    n_tables: int | None = None,
    probe_radius: int = 3,
    index: LshIndex | None = None,
    prune_probed: bool | None = None,
) -> DataFrame:
    """Approximate top-k via sign-random-projection LSH buckets — the
    bucketed sibling of ``ivf_topk`` (the north star names either as
    the scale path; we ship both).

    Per table, corpus vectors hash once to a 2^n_planes-bucket code
    (the seeded vectorized SRP shared with the embedding near-dup pass
    — the bucket table is a persistable index); each query probes every
    code within Hamming distance ``probe_radius`` of its own. Candidate
    (query, vector) pairs are deduped across tables/probes, then scored
    with exact cosine. Touch fraction/table ≈ Σ_{r≤R} C(n_planes,r) /
    2^n_planes (≈14 % at 8 planes, radius 2).

    Recall is geometry-dependent — SRP collision probability per plane
    is 1 − θ/π, so LSH needs neighbors meaningfully closer than random.
    On the driver testdata (near-uniform 64-d, top-10 cosine ≈ 0.3 —
    the hardest case): measured recall@10 at the defaults (2 tables,
    radius 3) is 0.88 at sf0.01 and 0.84 at sf0.1 — the measured sweet
    spot of the (tables, radius) grid: radius 3 beats an extra table at
    equal touch (~36 %/table on this worst-case geometry). On clustered
    corpora (real embeddings) the same code delivers high recall at far
    smaller touch. Deterministic: seeded planes per table, (score desc,
    key asc) tie-break.

    ``index`` accepts the prebuilt :class:`LshIndex` from
    :func:`build_lsh_index` — built once, persisted, reused across
    query batches, the same amortized convention as ``ivf_topk``.
    Query probes re-derive each table's planes from the index's own
    ``(n_planes, seed_base)``, so a persisted index stays consistent
    with the probe side by construction; the parameters travel WITH
    the tables rather than being re-supplied by the caller. Passing
    ``n_tables`` alongside ``index`` raises (the table count is the
    index's), as does a conflicting ``n_planes``.
    """
    import itertools

    from steam_data_pipeline_spark.llm.dedup import _srp_bucket_udf

    built_inline = index is None
    if index is None:
        index = build_lsh_index(
            corpus,
            key,
            vec_col,
            n_planes if n_planes is not None else 8,
            n_tables if n_tables is not None else 2,
        )
    else:
        if not isinstance(index, LshIndex):
            raise TypeError(
                "lsh_topk: index= takes the LshIndex returned by "
                "build_lsh_index (a bare table list cannot prove which "
                "n_planes/seed it was built under — reconstruct "
                "LshIndex(tables, n_planes=..., seed_base=...) from "
                "the persisted build parameters)"
            )
        if n_tables is not None:
            raise ValueError(
                f"lsh_topk: n_tables={n_tables} conflicts with index= "
                f"(the index has {index.n_tables} tables and its count "
                "is authoritative — drop the n_tables argument)"
            )
        if n_planes is not None and n_planes != index.n_planes:
            raise ValueError(
                f"lsh_topk: n_planes={n_planes} does not match the "
                f"index build (n_planes={index.n_planes}); a mismatch "
                "would silently shrink candidate overlap to near "
                "self-hits"
            )
    n_planes = index.n_planes
    masks = [0] + [
        sum(1 << b for b in bits)
        for r in range(1, probe_radius + 1)
        for bits in itertools.combinations(range(n_planes), r)
    ]
    vecs = drop_null_vectors(corpus, vec_col).select(key, vec_col)
    qsel = drop_null_vectors(queries, vec_col).select(
        query_key, F.col(vec_col).alias("__qvec")
    )
    cands = None
    # Static touched-bucket pruning (the operators/upsert.py doctrine):
    # Spark's dynamic partition pruning does NOT fire for this
    # broadcast join (measured — the probe read every bucket
    # directory), so the probed bucket set — bounded by
    # min(|queries|·|masks|, 2^n_planes) per table — is pushed as an
    # IN predicate, which a __bucket-partitioned reloaded table prunes
    # at the file listing. Cost: ONE job collecting every table's base
    # codes for the bounded query batch (mask expansion is driver-side
    # integer XOR). Skipped for in-query lineage indexes (no scan to
    # prune). prune_probed=None (the default) resolves to
    # ``index.reloaded`` — prune exactly when the index is file-backed;
    # a prebuilt-but-in-memory index has no scan to cut, so the probe-
    # code collect would be pure cost (ADVICE r9). True forces the
    # collect+filter, False disables it — for callers whose probe set
    # provably covers ~every bucket, and for the ann-prune rehearsal's
    # on/off comparison (tools/scale_rehearsal.py).
    if prune_probed is None:
        prune_probed = index.reloaded
    prebuilt = not built_inline and prune_probed
    blists: list[list[int] | None] = [None] * index.n_tables
    if prebuilt:
        srps = [
            _srp_bucket_udf(n_planes, seed=index.seed_base + t)
            for t in range(index.n_tables)
        ]
        base = qsel.select(
            *[srps[t](F.col("__qvec")).alias(f"__b{t}") for t in range(index.n_tables)]
        ).collect()
        blists = [
            sorted({int(r[f"__b{t}"]) ^ m for r in base for m in masks})
            for t in range(index.n_tables)
        ]
    for table, tagged in enumerate(index.tables):
        srp = _srp_bucket_udf(n_planes, seed=index.seed_base + table)
        probes = (
            qsel.withColumn("__b0", srp(F.col("__qvec")))
            .select(
                query_key,
                F.explode(
                    F.array(*[F.col("__b0").bitwiseXOR(F.lit(m)) for m in masks])
                ).alias("__bucket"),
            )
        )
        if prebuilt:
            if not blists[table]:
                continue
            flt = F.col("__bucket").isin(blists[table])
            if index.bgrp_shift is not None:
                # bucket-group layout (save_lsh_index): directory
                # pruning on the probed groups, then the __bucket IN
                # predicate prunes row groups/files via parquet stats
                # (files are sorted by __bucket within each group)
                flt = (
                    F.col("__bgrp").isin(
                        sorted({b >> index.bgrp_shift for b in blists[table]})
                    )
                    & flt
                )
            tagged = tagged.filter(flt).select(key, "__bucket")
        pairs = tagged.join(F.broadcast(probes), on="__bucket").select(query_key, key)
        cands = pairs if cands is None else cands.union(pairs)
    if cands is None:
        # every table's probe set was empty (empty query batch)
        return (
            queries.select(query_key)
            .limit(0)
            .withColumn(key, F.lit(None).cast(corpus.schema[key].dataType))
            .withColumn("cosine", F.lit(None).cast("double"))
        )
    scored = (
        cands.distinct()
        .join(vecs, on=key)
        .join(F.broadcast(qsel), on=query_key)
        .select(query_key, key, cosine_expr(vec_col, "__qvec").alias("cosine"))
    )
    w = Window.partitionBy(query_key).orderBy(F.col("cosine").desc(), F.col(key).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    key: str = "vec_id",
    vec_col: str = "embedding",
    query_key: str = "query_id",
    n_centroids: int = 16,
    n_probe: int | None = None,
    index: IvfIndex | tuple[DataFrame, DataFrame] | None = None,
    prune_probed: bool | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the ``n_probe`` centroids nearest
    each query, exact cosine within the probed lists.

    ``index`` accepts the prebuilt :class:`IvfIndex` from
    :func:`build_ivf_index` — the production calling convention: the
    index is built once, persisted, and amortized across every query
    batch, so per-query cost is probe-only (the build-time centroid
    count travels with the index, so no per-batch ``count()`` job). A
    legacy bare ``(centroids, assignments)`` pair still works but pays
    one ``count()`` job to size the probe default when ``n_probe`` is
    omitted. When ``index`` is omitted entirely the index is built
    in-query (the registered demo query's shape).

    ``n_probe`` defaults to the probed FRACTION 5/16 of the index's
    actual centroid count (min 5) rather than a fixed count: a prebuilt
    index is sized ~√n, and probing a fixed 5 of, say, 141 centroids
    would silently collapse recall (measured 0.72 → 0.56 under 10×
    corpus growth at fixed probes). Pass an explicit ``n_probe`` to
    trade recall for touch deliberately.

    Measured on the driver's near-uniform 64-d embeddings fixture
    (the hardest geometry — top-10 cosine ≈ 0.3): seeded-KMeans
    centroids give recall@10 = 0.68 at 4/16 probes (up from 0.52 with
    hash-seeded averaging) and 0.75 at the 5/16 default; KMeans is
    converged by ~10 iterations, so the residual gap is the data's
    geometry, not index quality. Clustered real-world embeddings
    deliver far higher recall at smaller touch."""
    built_inline = index is None
    if index is None:
        index = build_ivf_index(corpus, key, vec_col, n_centroids)
    if isinstance(index, IvfIndex):
        cents, assign = index.centroids, index.assignments
        actual_c = index.n_centroids
    else:
        # legacy bare (centroids, assignments) pair: the build-time
        # centroid count was not carried, so sizing the probe default
        # costs one count() job — last resort only; prefer IvfIndex
        # (or pass n_probe explicitly, as scale_rehearsal.py does)
        cents, assign = index
        actual_c = cents.count() if n_probe is None else -1
    if n_probe is None:
        n_probe = max(5, round(actual_c * 5 / 16))
    c = F.broadcast(cents.select("centroid_id", "centroid"))
    qprobe = (
        drop_null_vectors(queries, vec_col)
        .select(query_key, F.col(vec_col).alias("__qvec"))
        .crossJoin(c)
        .select(
            query_key,
            "__qvec",
            "centroid_id",
            cosine_expr("__qvec", "centroid").alias("__sim"),
        )
    )
    wq = Window.partitionBy(query_key).orderBy(F.col("__sim").desc(), F.col("centroid_id"))
    probes = (
        qprobe.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select(query_key, "__qvec", "centroid_id")
    )
    if prune_probed is None:
        # auto: prune only when the assignments table is file-backed
        # (load_ivf_index sets reloaded) — an in-memory prebuilt index
        # (or the legacy bare pair, which cannot prove it is file-
        # backed) has no partitioned scan to cut, so the probe collect
        # would be pure cost (ADVICE r9); pass True to force.
        prune_probed = isinstance(index, IvfIndex) and index.reloaded
    if not built_inline and prune_probed:
        # Static touched-list pruning, same rationale as lsh_topk:
        # dynamic partition pruning does not fire for this broadcast
        # join, so the probed centroid ids — bounded by n_centroids —
        # are collected and pushed as an IN predicate that a reloaded
        # centroid_id-partitioned assignments table prunes at the file
        # listing. One tiny job over the bounded query batch; skipped
        # when the index was just built in-query (lineage, no scan).
        plist = [
            r["centroid_id"]
            for r in probes.select("centroid_id").distinct().collect()
        ]
        if not plist:
            return (
                queries.select(query_key)
                .limit(0)
                .withColumn(key, F.lit(None).cast(corpus.schema[key].dataType))
                .withColumn("cosine", F.lit(None).cast("double"))
            )
        assign = assign.filter(F.col("centroid_id").isin(plist))
    scored = assign.join(F.broadcast(probes), on="centroid_id").select(
        query_key,
        key,
        cosine_expr(vec_col, "__qvec").alias("cosine"),
    )
    w = Window.partitionBy(query_key).orderBy(F.col("cosine").desc(), F.col(key).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Add symmetric per-vector int8 quantization columns:
    ``__q`` (array<int> in [-127, 127]) and ``__qs`` (the per-vector
    scale, max|x|/127). The 100 TB rationale: the corpus-side vector
    bytes drop ~4× (int8 vs float32, 8× vs float64) and the dot
    product becomes an exact INTEGER fold — quantization error enters
    only through the two scales, one multiply per pair."""
    amax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))
    scale = F.greatest(amax, F.lit(1e-30)) / F.lit(127.0)
    return df.withColumn("__qs", scale).withColumn(
        "__q",
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x / F.col("__qs")).cast("int"),
        ),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    key: str = "vec_id",
    vec_col: str = "embedding",
    query_key: str = "query_id",
) -> DataFrame:
    """Top-k cosine neighbors over int8-QUANTIZED vectors — the
    memory-bound scale path: scan cost is dominated by vector bytes at
    100 TB, and int8 cuts them 4-8× while the per-pair work becomes an
    integer zip-fold plus one float multiply. Norms are taken over the
    quantized vectors too, so the score is the exact cosine OF THE
    QUANTIZED representation (scales cancel) — recall vs the float
    truth is the quality contract, enforced in-query by the recall
    invariant (llm_sim_quantized: >= 0.9 measured with margin on
    64-dim vectors; int8 keeps ~2 decimal digits per coordinate).
    Deterministic tie-break: (score desc, key asc)."""
    cq = quantize_int8(drop_null_vectors(corpus, vec_col), vec_col)
    qq = quantize_int8(drop_null_vectors(queries, vec_col), vec_col)
    q = F.broadcast(
        qq.select(
            F.col(query_key),
            F.col("__q").alias("__qv"),
        )
    )
    idot = F.aggregate(
        F.zip_with(F.col("__q"), F.col("__qv"), lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    inorm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda a: (a * a).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double")
    )
    scored = (
        cq.select(key, "__q")
        .crossJoin(q)
        .select(
            query_key,
            key,
            (
                idot.cast("double")
                / F.greatest(
                    inorm("__q") * inorm("__qv"), F.lit(1e-30)
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_key).orderBy(
        F.col("cosine").desc(), F.col(key).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
