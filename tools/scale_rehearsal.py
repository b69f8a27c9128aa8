"""Scale rehearsals: synthesize larger or skewed corpora and measure
wall / output volume / recall for the operators whose 100 TB posture
rests on candidate-generation claims (SCALE.md records the curves).

Committed (rather than ad-hoc) so every round re-runs the SAME
measurement. Usage:

    python tools/scale_rehearsal.py ann [--factors 1 3 10]
    python tools/scale_rehearsal.py substring-skew

* ``ann`` — grow the embeddings corpus by appending seeded standard-
  normal 64-d vectors (the driver fixture's own near-uniform geometry,
  the hardest case for bucketed ANN) and measure, per corpus size:
  brute-force truth wall, IVF wall + recall@10, LSH wall + recall@10.
  The claim under test: probe cost tracks the probed FRACTION (wall
  grows ~linearly in corpus at fixed fraction) and recall holds as the
  corpus grows — i.e. neither index degrades structurally with n.

* ``substring-skew`` — prepend one shared 14-token boilerplate
  sentence to EVERY document (a 100%-document hot window pattern) and
  compare ``duplicated_spans`` wall + row counts vs the clean corpus.
  The claim under test (SCALE.md round-4 notes): the dup-hash groupBy
  partial-aggregates the hot hashes map-side and the LEFT SEMI build
  side stays 1 row/hash, so corpus-wide boilerplate cannot create a
  hot join key — wall and output stay ~linear, no n² blowup.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from steam_data_pipeline_spark.session import get_spark

    return get_spark("scale-rehearsal")


def _force(df) -> int:
    """Materialize end-to-end and return the row count (one pass)."""
    return df.count()


def rehearse_ann(sf_dir: str, factors: list[int]) -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from steam_data_pipeline_spark.llm.simsearch import (
        brute_force_topk,
        build_ivf_index,
        ivf_topk,
        lsh_topk,
    )
    from steam_data_pipeline_spark.sources.tables import read_table

    spark = _spark()
    base = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n0 = base.count()
    # synthetic ids start past the real max: if the fixture's ids were
    # assumed contiguous 0..n0-1 but are sparse/offset, n0+i would
    # collide with real ids and silently corrupt the recall measure
    id_base = base.agg(F.max("vec_id")).first()[0] + 1
    dim = len(base.select("embedding").first()[0])
    queries = base.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 10

    print(f"# ann rehearsal: base corpus {n0} x {dim}, k={k}, 5 queries")
    print(
        "factor\tn\tbrute_s\tivf_build_s\tivf_probe_s\tivf_recall"
        "\tlsh_s\tlsh_recall"
    )
    for f in factors:
        corpus = base
        if f > 1:
            rng = np.random.default_rng(1234 + f)
            extra = rng.standard_normal(((f - 1) * n0, dim))
            pdfs = [
                ((id_base + i), [float(x) for x in row])
                for i, row in enumerate(extra)
            ]
            extra_df = spark.createDataFrame(
                pdfs, "vec_id long, embedding array<double>"
            ).select(
                "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
            )
            corpus = base.union(extra_df)
        # pin the corpus so each index measures search, not regeneration
        corpus = corpus.localCheckpoint(eager=True)
        n = corpus.count()

        t0 = time.time()
        truth = {
            (r["query_id"], r["vec_id"])
            for r in brute_force_topk(corpus, queries, k=k).collect()
        }
        brute_s = time.time() - t0

        # production index sizing (suggest_ivf_params: centroids ~
        # sqrt(n), probes hold the 5/16 fraction) — a FIXED 16-centroid
        # index on a growing corpus degrades recall (measured: 0.72 ->
        # 0.56 from 2k to 20k vectors). Build and probe are timed
        # separately: the index is built ONCE and amortized across
        # query batches (ivf_topk's ``index=`` calling convention), so
        # probe-only is the per-query production cost.
        from steam_data_pipeline_spark.llm.simsearch import suggest_ivf_params

        n_centroids, n_probe = suggest_ivf_params(n)
        t0 = time.time()
        built = build_ivf_index(corpus, n_centroids=n_centroids)
        from steam_data_pipeline_spark.llm.simsearch import IvfIndex

        prebuilt = IvfIndex(
            built.centroids.localCheckpoint(eager=True),
            built.assignments.localCheckpoint(eager=True),
            built.n_centroids,
        )
        ivf_build_s = time.time() - t0
        t0 = time.time()
        ivf = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(
                corpus, queries, k=k, n_probe=n_probe, index=prebuilt
            ).collect()
        }
        ivf_s = time.time() - t0

        t0 = time.time()
        lsh = {
            (r["query_id"], r["vec_id"])
            for r in lsh_topk(corpus, queries, k=k).collect()
        }
        lsh_s = time.time() - t0

        ivf_rec = len(ivf & truth) / len(truth)
        lsh_rec = len(lsh & truth) / len(truth)
        print(
            f"{f}x\t{n}\t{brute_s:.2f}\t{ivf_build_s:.2f}\t{ivf_s:.2f}"
            f"\t{ivf_rec:.3f}\t{lsh_s:.2f}\t{lsh_rec:.3f}"
        )
    spark.stop()


BOILERPLATE = (
    "this page is provided for informational purposes only "
    "please review the terms before continuing"
)  # 14 tokens -> 7 repeated 8-windows at the head of EVERY doc


def rehearse_substring_skew(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from steam_data_pipeline_spark.llm.dedup import duplicated_spans
    from steam_data_pipeline_spark.sources.tables import read_table

    spark = _spark()
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()

    skewed = docs.select(
        "doc_id", F.concat(F.lit(BOILERPLATE + " "), F.col("text")).alias("text")
    )

    # one warm pass so neither measured run pays first-use machinery
    _force(duplicated_spans(docs.limit(64), k=8))

    print(f"# substring-skew rehearsal: {n} docs, boilerplate in 100% of docs")
    print("corpus\twall_s\tspans\tspan_rows_per_doc")
    for label, d in (("clean", docs), ("skewed", skewed)):
        # write/read through parquet so both runs pay the same scan shape
        tmp = tempfile.mkdtemp(prefix=f"rehearse_sub_{label}_")
        d.write.mode("overwrite").parquet(tmp)
        dd = spark.read.parquet(tmp)
        t0 = time.time()
        spans = _force(duplicated_spans(dd, k=8))
        wall = time.time() - t0
        print(f"{label}\t{wall:.2f}\t{spans}\t{spans / n:.3f}")
    spark.stop()


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("op", choices=["ann", "substring-skew"])
    p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p.add_argument("--factors", nargs="*", type=int, default=[1, 3, 10])
    args = p.parse_args()
    if args.op == "ann":
        rehearse_ann(args.sf_dir, args.factors)
    else:
        rehearse_substring_skew(args.sf_dir)


if __name__ == "__main__":
    main()
