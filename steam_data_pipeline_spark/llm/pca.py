"""Distributed PCA over an embedding column.

The decorrelation/whitening step real curation pipelines run before
semantic clustering (SemDeDup, Abbas et al. 2023, PCA-reduces
embeddings before k-means) and before ANN index build (IVF on
decorrelated vectors probes fewer lists for the same recall).  No
reference analog — north-star extension.

Architecture (the Spark-native shape for a tall-skinny Gramian):

1. **Quantize** each component to an exact integer (``round(x·10⁶)``,
   JVM-side array transform) — from here on, all distributed
   arithmetic is EXACT, so the moment matrix is bit-identical however
   Spark partitions the scan (float summation order can never leak
   into the result).
2. **Partial Gramians per partition** (``mapInPandas``): each Arrow
   batch contributes ``QᵀQ`` (int64 matmul, d×d) plus component sums
   and a row count — the classic tree-aggregate shape: the shuffle
   carries ``O(partitions · d²)`` tiny rows, never the data.
3. **Exact final reduce**: ``groupBy(i,j).sum`` over DECIMAL(38,0) —
   overflow-safe far beyond int64 (per-partition int64 partials are
   safe up to ~3·10⁷ rows/partition at this quantization; the final
   decimal sum is safe to ~10³⁸).
4. **Driver eigensolve** on the d×d covariance (d=64 ⇒ trivial;
   the ONLY driver-side math, on a bounded 2 080-value collect).

Oracle strategy: eigenvectors are not SQL-expressible, so the
registered query emits (a) the EXACT integer trace numerator as a
string — DuckDB recomputes it independently from the same quantized
moments (HUGEINT), pinning the entire distributed phase value-exactly
— and (b) spectral invariants as booleans (eigenvalue sum = trace,
descending order, orthonormal basis, eigenvalue/explained-variance
bounds) that the oracle predicts as constants.  This is the repo's
established invariant-oracle pattern (agg_hll_mergeable,
agg_countmin_tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fixed-point quantization scale for embedding components
SCALE = 1_000_000

#: micro-quantization DOMAIN (r12 numeric-extremes contract): a
#: component with |x| beyond this cannot be quantized into signed-64
#: micro units (x * SCALE would overflow), so the whole VECTOR is
#: dropped at ingestion — NULLing one component would corrupt the
#: moment matrix alignment. 9e12 * 1e6 = 9e18 < 2^63. Oracles mirror
#: with len(list_filter(embedding, x -> ABS(...) > 9e12)) = 0.
QUANT_BOUND = 9.0e12

#: Lower edge of the micro-quantization domain (r13 combined-axis
#: finding): a vector whose LARGEST |component| is below 5e-7 rounds
#: to the ALL-ZERO fixed-point vector — no direction information
#: survives quantization, so its PCA projection/cluster assignment is
#: arbitrary while its ORIGINAL-space cosine can still be ~1 to a
#: scaled twin (a float32-denormal x1e-40 copy broke SemDeDup's
#: identical=>same-cluster completeness argument). Such vectors are
#: out of the quantization domain, symmetric with QUANT_BOUND.
#: Oracle mirror: AND list_max(list_transform(embedding,
#: x -> ABS(CAST(x AS DOUBLE)))) >= 5e-7.
QUANT_EPS = 5.0e-7


def quantizable_components(col) -> "F.Column":
    """True iff every component is non-NULL and inside QUANT_BOUND,
    and at least one component reaches QUANT_EPS (the quantized vector
    is not identically zero)."""
    return (
        F.size(
            F.filter(
                col,
                lambda x: x.isNull()
                | (F.abs(x.cast("double")) > F.lit(QUANT_BOUND)),
            )
        )
        == 0
    ) & (
        F.array_max(
            F.transform(col, lambda x: F.abs(x.cast("double")))
        )
        >= F.lit(QUANT_EPS)
    )


def quantized(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(qv: array<long>) — exact fixed-point components.

    NULL vectors are dropped and the dimension is pinned to the first
    row's (ragged/truncated rows are dropped too, not silently
    zero-padded into the moments): messy upstream embeddings must not
    crash the Gramian matmul or corrupt the covariance — the
    try_parse_url lesson applied to the vector column. NULL
    *components* would quantize to NULL and poison a whole Gramian
    row, so they are filtered with the same policy."""
    base = emb.filter(F.col(vec_col).isNotNull())
    probe = base.select(F.size(vec_col).alias("d")).first()
    if probe is None:
        raise ValueError(f"pca: no non-null rows in {vec_col!r}")
    d = probe["d"]
    return (
        base.filter(
            (F.size(vec_col) == d)
            & quantizable_components(F.col(vec_col))
        )
        .select(
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * F.lit(SCALE), 0).cast(
                    "long"
                ),
            ).alias("qv")
        )
    )


def moment_sums(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact second-moment sums of the quantized embeddings.

    Returns (i, j, v: decimal(38,0)) rows: upper-triangle Gramian
    entries Σ q_i·q_j for i ≤ j, component sums Σ q_i as (i, -1), and
    the row count as (-1, d) — the count row's otherwise-unused j slot
    carries the dimension, so the whole operator is ONE mapInPandas
    pass + one tiny map-side-combined shuffle of d(d+1)/2 + d + 1 keys
    per partition, with no extra driver probe job (the previous
    ``q.first()`` dimension probe cost one full scan-start per call;
    every surviving row has exactly d components by ``quantized``'s
    size filter, so each partition reports the same j and the groupBy
    merges the count rows). Empty input (every row dropped by the
    quantization domain) yields zero rows; :func:`_moment_model`
    raises the messy-embeddings ValueError on that.
    """
    import pandas as pd

    q = quantized(emb, vec_col)

    def partials(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf["qv"].to_list(), dtype=np.int64)
            g = m.T @ m  # exact int64 (see module docstring bound)
            s = m.sum(axis=0)
            iu, ju = np.triu_indices(m.shape[1])
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu, np.arange(m.shape[1]), [-1]]
                    ).astype("int32"),
                    "j": np.concatenate(
                        [ju, np.full(m.shape[1], -1), [m.shape[1]]]
                    ).astype("int32"),
                    "v": np.concatenate([g[iu, ju], s, [m.shape[0]]]),
                }
            )

    parts = q.mapInPandas(partials, schema="i int, j int, v long")
    return parts.groupBy("i", "j").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("v")
    )


def _moment_model(emb: DataFrame, vec_col: str):
    """Shared moment-collect → exact covariance assembly for
    :func:`pca_invariants` and :func:`pca_project` (previously
    duplicated verbatim in both, each paying its own distributed
    moment pass). Returns ``(n, d, C, mean, trace_num)``: row count,
    dimension, float covariance (one rounding per entry from exact
    integer moments), float mean vector, and the exact integer
    population-trace numerator (python ints, arbitrary precision)."""
    import numpy as np

    rows = moment_sums(emb, vec_col).collect()
    if not rows:
        # the probe row pinned d but every row was dropped (ragged vs
        # the probed dimension, or NULL components) — surface the
        # messy-embeddings policy error, not an IndexError
        # all-NULL / empty input raises in quantized() before this point,
        # so only the policy-filtered shapes below can land here
        raise ValueError(
            f"pca: no usable rows in {vec_col!r} "
            "(ragged vs the probed dimension, or containing NULL "
            "components)"
        )
    # the count row (i = -1) carries d in its j slot (see moment_sums)
    n = None
    d = next(r["j"] for r in rows if r["i"] == -1)
    G = np.zeros((d, d), dtype=object)
    s = [0] * d
    for r in rows:
        i, j, v = r["i"], r["j"], int(r["v"])
        if i == -1:
            n = v
        elif j == -1:
            s[i] = v
        else:
            G[i][j] = v
            G[j][i] = v
    trace_num = n * sum(int(G[i][i]) for i in range(d)) - sum(
        si * si for si in s
    )
    Gf = np.array([[float(int(G[i][j])) for j in range(d)] for i in range(d)])
    sf = np.array([float(si) for si in s])
    C = (Gf / n - np.outer(sf / n, sf / n)) / float(SCALE) ** 2
    return n, d, C, sf / n / SCALE, trace_num


def pca_invariants(
    emb: DataFrame, vec_col: str = "embedding", top_k: int = 8
) -> DataFrame:
    """Registered-query form: top-``top_k`` principal components'
    spectral invariants + the exact trace numerator.

    Output (one row per component 1..top_k):
      component BIGINT, n_vecs BIGINT, d BIGINT,
      trace_num VARCHAR  — exact integer n·ΣᵢΣᵣq²ᵣᵢ − Σᵢ(Σᵣqᵣᵢ)²,
                           the population-covariance trace scaled by
                           n²·SCALE² (oracle recomputes in HUGEINT),
      eigsum_ok, ordered_ok, orthonormal_ok, bounds_ok BOOLEAN.

    The collect is bounded by construction: d(d+1)/2 + d + 1 moment
    rows (2 145 for d=64), independent of corpus size.
    """
    import numpy as np

    spark = emb.sparkSession
    n, d, C, _mean, trace_num = _moment_model(emb, vec_col)
    evals, evecs = np.linalg.eigh(C)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    trace = float(trace_num) / (n * n * SCALE**2)
    eps = 1e-9 * max(trace, 1.0)
    eigsum_ok = bool(abs(float(evals.sum()) - trace) <= 1e-6 * max(trace, 1e-12))
    ordered_ok = bool(np.all(np.diff(evals) <= eps))
    orthonormal_ok = bool(
        np.max(np.abs(evecs.T @ evecs - np.eye(d))) < 1e-8
    )
    lam_max_lb = float(np.max(np.diag(C)))  # Rayleigh: λ₁ ≥ max variance
    bounds_ok = bool(
        evals[0] >= lam_max_lb - eps
        and evals[0] <= trace + eps
        and np.all(evals >= -eps)
        and float(np.cumsum(evals)[: top_k].max()) <= trace + eps
    )
    out = [
        (
            k + 1,
            n,
            d,
            str(trace_num),
            eigsum_ok,
            ordered_ok,
            orthonormal_ok,
            bounds_ok,
        )
        for k in range(top_k)
    ]
    return spark.createDataFrame(
        out,
        "component long, n_vecs long, d long, trace_num string, "
        "eigsum_ok boolean, ordered_ok boolean, orthonormal_ok boolean, "
        "bounds_ok boolean",
    )


def pca_project(
    emb: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    top_k: int = 8,
) -> DataFrame:
    """(key, pc: array<double>) — project every embedding onto the
    top-``top_k`` principal directions (mean-centered).  The projection
    matrix is a driver-side (d × k) broadcast literal; the projection
    itself is a JVM-side array fold — no Python in the per-row path.

    Downstream of :func:`pca_invariants`' moment collect; the demo
    composition for SemDeDup-style clustering on reduced vectors.
    """
    import numpy as np

    n, d, C, mean, _trace_num = _moment_model(emb, vec_col)
    evals, evecs = np.linalg.eigh(C)
    order = np.argsort(evals)[::-1][:top_k]
    V = evecs[:, order]  # d × k
    v_lit = F.array(
        *[
            F.array(*[F.lit(float(V[i, k])) for i in range(d)])
            for k in range(V.shape[1])
        ]
    )
    m_lit = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), m_lit, lambda x, m: x - m
    )
    # Project ONLY rows that entered the model: quantized() drops
    # NULL/ragged/NULL-component vectors from the moments, and a row
    # excluded there must not silently come back as a null-padded pc
    # array here (zip_with pads the short side with NULLs and the
    # aggregate fold propagates them — downstream k-means would choke).
    clean = emb.filter(
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) == d)
        & quantizable_components(F.col(vec_col))
    )
    return clean.select(
        key,
        F.transform(
            v_lit,
            lambda col_k: F.aggregate(
                F.zip_with(centered, col_k, lambda x, w: x * w),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
        ).alias("pc"),
    )
