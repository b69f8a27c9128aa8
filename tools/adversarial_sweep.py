"""Adversarial differential sweep: NULLs + ties the fixtures never had.

The round-11 module review's micro-fixture found 5 real cross-engine
divergences (NULL flags merging islands, ANSI DIVIDE_BY_ZERO crashes,
round(NaN) crashes, arbitrary equal-ts tie picks) — every one invisible
at all three driver SFs because the generated testdata contains no
NULLs and no (user_id, ts) collisions anywhere. This tool generalizes
that method to the WHOLE registry:

1. derive an sf0.001-based corpus where a deterministic ~4% of every
   nullable VALUE column is NULL (keys and ordering spines are kept —
   ts/user_id/event_id stay intact so the sweep isolates value-NULL
   semantics from NULL-ordering semantics, which differ by engine and
   deserve their own pass), plus ~2% duplicated (user_id, ts) tie rows
   in events with fresh event_ids and shifted values;
2. run EVERY registered query against its DuckDB oracle on that corpus
   through the standard difftest harness (strict value-exact mode);
3. print the failures — each one is a real robustness finding: a crash
   class (ANSI arithmetic, sqrt(negative), round(NaN)) or a semantic
   divergence (CASE vs cast NULL handling, tie nondeterminism).

Usage:
    python tools/adversarial_sweep.py [--base /root/testdata/sf0.001]
                                      [--names q1 q2 ...]

The corpus is rebuilt from scratch on every run (cheap at sf0.001) so
the tool stays deterministic across testdata regenerations.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (table, key expression used to seed the deterministic hash, columns to
# null at the standard rate). Keys, FK join columns and ordering spines
# are deliberately absent — except customer.c_nationkey, included at a
# lower rate because a NULL FK is a semantics-bearing input (LEFT joins
# must keep the row, inner joins must drop it, identically on both
# engines).
NULL_PLAN: dict[str, tuple[str, list[str]]] = {
    "part": ("p_partkey", ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
    "orders": ("o_orderkey", ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]),
    "lineitem": (
        "l_orderkey * 10 + l_linenumber",
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"],
    ),
    "customer": ("c_custkey", ["c_name", "c_acctbal", "c_mktsegment"]),
    "events": ("event_id", ["event_type", "value", "props"]),
    "documents": ("doc_id", ["text", "lang", "source", "n_chars"]),
    "embeddings": ("vec_id", ["embedding", "label"]),
    "supplier": ("s_suppkey", ["s_name", "s_acctbal"]),
}
NULL_RATE = 25  # 1-in-25 = 4%
FK_RATE = 50  # 1-in-50 = 2% for customer.c_nationkey
TIE_RATE = 50  # 1-in-50 events rows duplicated at the same (user, ts)
# empty-value axis (phase 2): empty strings / empty arrays are the most
# realistic dirty input an LLM pipeline sees (blank documents, failed
# embedding rows) and exercise a DIFFERENT code path than NULL — e.g.
# split('') yields [''] and an all-empty-doc shared shingle, while
# split(NULL) yields NULL. Injected on a residue class disjoint from
# the NULL one so the two axes never collide on a row.
EMPTY_RATE = 40  # 1-in-40 = 2.5%, residue 1 (NULLs use residue 0)
# Residue-disjointness proof for ALL the %40 classes vs the %25 NULL
# class: gcd(25, 40) = 5, and 5 divides the NULL residue (0) but none
# of 1/2/3 — so hash%25==0 ∧ hash%40∈{1,2,3} has no solution; the axes
# never collide on one row.

# round-12 axis (a): Unicode / multi-byte text — multi-byte shingles,
# combining characters, RTL runs, astral-plane (surrogate-pair) chars.
# Exercises BPE byte/char handling, shingling, langid, and any
# length-vs-byte-length divergence between Spark and DuckDB. Residue 2
# PREFIXES a snippet onto real text (tokenizer boundary stress);
# residue 3 REPLACES the text with a pure-Unicode document (langid /
# quality-scorer stress). No apostrophes in snippets (SQL literals).
UNICODE_SNIPPETS = [
    "深度学习模型训练数据 需要大规模语料库",  # CJK, no ASCII spacesaving
    "👩‍💻🚀🔥 🧬🌍✨",  # emoji incl. ZWJ sequences
    "café naïve résumé",  # combining accents (NFD)
    "‏مرحبا بالعالم هذا نص عربي",  # RTL Arabic with RLM
    "שלום עולם טקסט בדיקה",  # RTL Hebrew
    "𝕳𝖊𝖑𝖑𝖔 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝒯𝑒𝓈𝓉",  # astral plane (UTF-16 surrogate pairs)
    "Ωμέγα δοκιμή ΑΛΦΆΒΗΤΟ ß ẞ",  # Greek + sharp-s case edges
]
UNI_RATE = 40  # residues 2 (prefix) and 3 (replace)

# round-12 axis (b): numeric extremes — ±1e308 doubles and true
# denormals in events.value, boundary-magnitude prices (largest values
# whose cents representation is still exact in a double: 1e13 scale,
# cents < 2^53), a negative-extreme balance, and float32
# overflow/denormal embedding components (×1e30 squares past the
# float32 max into the double range; ×1e-40 lands below the float32
# normal minimum). Exercises the exact-decimal-sum discipline and the
# cosine/norm expressions. Residues 2 (big, hash-signed) and 3 (tiny).
EXTREME_NUM: dict[tuple[str, str], tuple[str, str, bool]] = {
    # (table, col) -> (big, tiny, signed_big)
    ("events", "value"): ("1e308", "5e-324", True),
    ("lineitem", "l_extendedprice"): ("9999999999999.99", "0.01", False),
    ("lineitem", "l_quantity"): ("999999999.0", "1e-9", False),
    ("orders", "o_totalprice"): ("9999999999999.99", "0.01", False),
    ("customer", "c_acctbal"): ("9999999999999.99", "1e-300", True),
    ("part", "p_retailprice"): ("99999999999.99", "1e-15", False),
}
EXTREME_RATE = 40  # residues 2 and 3, same disjointness argument

# round-13 axis (f): MALFORMED JSON in events.props — truncated
# objects, wrong-typed fields, bare scalars, empty containers, and a
# huge-int field (out of BIGINT). The NULL axis covers absent props;
# this covers CORRUPT props, the realest 100 TB dirty shape for a
# semi-structured column, and the place Spark (from_json/parse_json/
# get_json_object permissive mode) and DuckDB (json_extract_string)
# disagree most readily. Residues 2/3/4/6 (same %40 disjointness
# argument as the other axes; per-column hash seeds make them
# independent of the value-extreme residues on events.value).
MALFORMED_JSON = [
    '\'{"k": 12\'',  # truncated object
    '\'{"k": "notanint"}\'',  # wrong-typed field
    '\'[]\'',  # wrong container kind
    '\'{"k": 99999999999999999999999999}\'',  # out-of-BIGINT int
]
JSON_RATE = 40

# round-12 axis (c): timestamp extremes — far-future (year 9999) and
# PRE-EPOCH (1905: negative unix seconds/micros) event times and order
# dates, on residues 4 and 6: gcd(25,40)=5 divides neither 4 nor 6, so
# both are disjoint from the NULL class. (Residue 5 — used through
# round 12 — IS reachable together with hash%25==0, so on NULL-able
# date columns the NULL branch silently swallowed 1-in-200 pre-epoch
# rows; r12 ADVICE item 3.) Exercises
# negative-epoch integer day/week arithmetic (floor vs truncating
# division diverge below zero), date_trunc/dayofmonth parity far from
# the fixture's 2024 window, interval halos near the datetime range
# edge, and every time-ordered window's behavior when the spine spans
# 8000 years. Timestamps stay NON-NULL (they are ordering spines).
# r13: difftest now compares timestamp/date columns as exact
# epoch-micros STRINGS (difftest._epoch_str_spark/_oracle), so the old
# pandas datetime64[ns] harness wall at 2262 is gone — the far-future
# probe moved BEYOND it (2500), and two new residues pin the engine's
# own [1970, 2100) operational-contract edge: the last in-contract
# microsecond (2099-12-31 23:59:59.999999) and the first
# out-of-contract instant (2100-01-01 00:00:00).
# Values per (table, col): (far_beyond_wall, pre_epoch, edge_in,
# edge_out) on residues 4 / 6 / 8 / 9 — none divisible by
# gcd(25,40)=5, so all four stay disjoint from the %25 NULL class.
TS_EXTREMES: dict[tuple[str, str], tuple[str, str, str, str]] = {
    ("events", "ts"): (
        "TIMESTAMP '2500-06-15 12:34:56.789012'",
        "TIMESTAMP '1905-03-14 01:02:03.000042'",
        "TIMESTAMP '2099-12-31 23:59:59.999999'",
        "TIMESTAMP '2100-01-01 00:00:00'",
    ),
    ("orders", "o_orderdate"): (
        "TIMESTAMP '2500-11-30 00:00:00'",
        "TIMESTAMP '1905-06-15 00:00:00'",
        "TIMESTAMP '2099-12-31 00:00:00'",
        "TIMESTAMP '2100-01-01 00:00:00'",
    ),
}
TS_RATE = 40  # residues 4 (far), 6 (pre-epoch), 8 (edge-in), 9 (edge-out)


# --------------------------------------------------------------------------
# round-13 axis (e): degenerate distributions / SKEW. All prior axes
# vary VALUES; this corpus varies SHAPE, with values kept pristine so
# findings isolate to shape handling. Skew is the thing that kills real
# clusters, and it is exactly what the uniform generated fixtures never
# show: (a) ~90% of fact rows collapse onto ONE hot key (asof frames,
# win_islands run-length state, join_skew_salted's actual salting, LSH
# bucket occupancy all concentrate on one partition); (b) a large block
# of ALL-IDENTICAL documents and ALL-IDENTICAL embeddings (dedup
# clusters of size n — connected-components / cluster-representative /
# banded-LSH candidate paths, ANN ties); (c) single-day and
# single-language/source collapse (empty-group and one-group edges in
# drift / entropy / mix queries; total tie collapse on date spines).
HOT_RATE = 10  # 9-in-10 fact rows land on the hot key
DUP_DOC_RATE = 5  # 2-in-5 documents become the one canonical text
DUP_TEXT = (
    "the quick brown fox jumps over the lazy dog while the patient "
    "crane watches the river bend and counts the silver fish that "
    "drift past the mossy stones every single morning without fail"
)
SKEW_DAY = "TIMESTAMP '2024-01-15 00:00:00'"


def build_skew_dir(base: str, out_dir: str) -> str:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    hot_cust = con.execute(
        f"SELECT MIN(c_custkey) FROM '{base}/customer.parquet'"
    ).fetchone()[0]
    hot_part = con.execute(
        f"SELECT MIN(p_partkey) FROM '{base}/part.parquet'"
    ).fetchone()[0]
    hot_supp = con.execute(
        f"SELECT MIN(s_suppkey) FROM '{base}/supplier.parquet'"
    ).fetchone()[0]

    def hot(key: str, col: str, hot_val) -> str:
        h = f"hash(CAST({key} AS VARCHAR) || 'hot{col}')"
        return (
            f"CASE WHEN {h} % {HOT_RATE} != 0 THEN {hot_val} "
            f"ELSE {col} END AS {col}"
        )

    plans: dict[str, str | None] = {
        "region": None,
        "nation": None,
        "customer": None,
        "supplier": None,
        "part": None,
        # dims copied intact: skew is a fact/corpus phenomenon, and the
        # hot keys must keep their dimension rows for joins
        "orders": (
            "SELECT o_orderkey, "
            + hot("o_orderkey", "o_custkey", hot_cust)
            + f", o_orderstatus, o_totalprice, {SKEW_DAY} AS o_orderdate,"
            " o_orderpriority FROM src"
        ),
        # lineitem keeps its (orderkey, linenumber) identity — breaking
        # a primary key is corruption, not skew — and skews the
        # grouping/join keys instead
        "lineitem": (
            "SELECT l_orderkey, "
            + hot("l_orderkey * 10 + l_linenumber", "l_partkey", hot_part)
            + ", "
            + hot("l_orderkey * 10 + l_linenumber", "l_suppkey", hot_supp)
            + ", * EXCLUDE (l_orderkey, l_partkey, l_suppkey) FROM src"
        ),
        # hot user + every row on one DAY (time-of-day kept so the ts
        # spine still orders within the day; massive (user, ts)-tie
        # density on the hot key is the point)
        "events": (
            "SELECT event_id, "
            f"{SKEW_DAY} + (ts - date_trunc('day', ts)) AS ts, "
            + hot("event_id", "user_id", hot_cust)
            + ", event_type, value, props FROM src"
        ),
        # 40% of texts identical (one n-sized dup cluster), ALL rows one
        # language and one source (one-group / empty-other-group edges)
        "documents": (
            "SELECT doc_id, "
            f"CASE WHEN hash(CAST(doc_id AS VARCHAR) || 'dup') "
            f"% {DUP_DOC_RATE} < 2 THEN '{DUP_TEXT}' ELSE text END AS text, "
            "'en' AS lang, 'web' AS source, "
            "* EXCLUDE (doc_id, text, lang, source) FROM src"
        ),
        # 40% identical vectors (ANN/LSH bucket collapse, SemDeDup
        # clusters of size n, tied cosines), ALL rows one label
        "embeddings": (
            "SELECT vec_id, "
            "CASE WHEN hash(CAST(vec_id AS VARCHAR) || 'dup') "
            f"% {DUP_DOC_RATE} < 2 THEN "
            "(SELECT embedding FROM src WHERE vec_id = "
            " (SELECT MIN(vec_id) FROM src)) "
            "ELSE embedding END AS embedding, "
            "(SELECT MIN(label) FROM src WHERE label IS NOT NULL) AS label "
            "FROM src"
        ),
    }
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        src = f"{base}/{name}.parquet"
        dst = os.path.join(out_dir, f"{name}.parquet")
        q = plans.get(name)
        if q is None:
            shutil.copyfile(src, dst)
            continue
        q = q.replace("FROM src", f"FROM '{src}'").replace(
            "FROM src WHERE", f"FROM '{src}' WHERE"
        )
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
    return out_dir


def build_adversarial_dir(base: str, out_dir: str) -> str:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        src = f"{base}/{name}.parquet"
        dst = os.path.join(out_dir, f"{name}.parquet")
        if name in ("region", "nation"):
            shutil.copyfile(src, dst)  # tiny dims stay intact
            continue
        key, cols = NULL_PLAN[name]
        sel = []
        for row in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall():
            colname = row[0]
            if colname in cols:
                h = f"hash(CAST({key} AS VARCHAR) || '{colname}')"
                whens = [f"WHEN {h} % {NULL_RATE} = 0 THEN NULL"]
                if name == "documents" and colname == "text":
                    # empty text on residue 1 (disjoint from NULL res 0)
                    whens.append(f"WHEN {h} % {EMPTY_RATE} = 1 THEN ''")
                    pick = (
                        f"hash(CAST({key} AS VARCHAR) || 'uni') "
                        f"% {len(UNICODE_SNIPPETS)}"
                    )
                    snippet = (
                        "CASE "
                        + " ".join(
                            f"WHEN {pick} = {i} THEN '{s}'"
                            for i, s in enumerate(UNICODE_SNIPPETS)
                        )
                        + " END"
                    )
                    whens.append(
                        f"WHEN {h} % {UNI_RATE} = 2 "
                        f"THEN {snippet} || ' ' || text"
                    )
                    whens.append(f"WHEN {h} % {UNI_RATE} = 3 THEN {snippet}")
                if name == "embeddings" and colname == "embedding":
                    whens.append(f"WHEN {h} % {EMPTY_RATE} = 1 THEN []")
                    whens.append(
                        f"WHEN {h} % {EXTREME_RATE} = 2 THEN CAST("
                        f"list_transform(embedding, x -> x * 1e30) "
                        f"AS FLOAT[])"
                    )
                    whens.append(
                        f"WHEN {h} % {EXTREME_RATE} = 3 THEN CAST("
                        f"list_transform(embedding, x -> x * 1e-40) "
                        f"AS FLOAT[])"
                    )
                if name == "events" and colname == "props":
                    for ri, lit in zip((2, 3, 4, 6), MALFORMED_JSON):
                        whens.append(
                            f"WHEN {h} % {JSON_RATE} = {ri} THEN {lit}"
                        )
                if (name, colname) in TS_EXTREMES:
                    far, pre, ein, eout = TS_EXTREMES[(name, colname)]
                    whens.append(f"WHEN {h} % {TS_RATE} = 4 THEN {far}")
                    whens.append(f"WHEN {h} % {TS_RATE} = 6 THEN {pre}")
                    whens.append(f"WHEN {h} % {TS_RATE} = 8 THEN {ein}")
                    whens.append(f"WHEN {h} % {TS_RATE} = 9 THEN {eout}")
                if (name, colname) in EXTREME_NUM:
                    big, tiny, signed = EXTREME_NUM[(name, colname)]
                    sign = f"hash(CAST({key} AS VARCHAR) || 'sign') % 2"
                    big_expr = (
                        f"(CASE WHEN {sign} = 0 THEN {big} ELSE -{big} END)"
                        if signed
                        else big
                    )
                    whens.append(
                        f"WHEN {h} % {EXTREME_RATE} = 2 THEN {big_expr}"
                    )
                    whens.append(f"WHEN {h} % {EXTREME_RATE} = 3 THEN {tiny}")
                sel.append(
                    f"CASE {' '.join(whens)} ELSE {colname} END AS {colname}"
                )
            elif (name, colname) in TS_EXTREMES:
                # ordering-spine column: mutate, never NULL
                far, pre, ein, eout = TS_EXTREMES[(name, colname)]
                h = f"hash(CAST({key} AS VARCHAR) || '{colname}')"
                sel.append(
                    f"CASE WHEN {h} % {TS_RATE} = 4 THEN {far} "
                    f"WHEN {h} % {TS_RATE} = 6 THEN {pre} "
                    f"WHEN {h} % {TS_RATE} = 8 THEN {ein} "
                    f"WHEN {h} % {TS_RATE} = 9 THEN {eout} "
                    f"ELSE {colname} END AS {colname}"
                )
            else:
                sel.append(colname)
        q = f"SELECT {', '.join(sel)} FROM '{src}'"
        if name == "customer":
            q = q.replace(
                "c_nationkey",
                f"CASE WHEN hash(CAST(c_custkey AS VARCHAR) || 'fk') "
                f"% {FK_RATE} = 0 THEN NULL ELSE c_nationkey END AS c_nationkey",
            )
        if name == "events":
            # tie rows: same (user_id, ts), fresh event_id past the max,
            # value shifted so the tie actually distinguishes picks
            q = f"""
            WITH base AS ({q}),
            mx AS (SELECT MAX(event_id) AS m FROM base),
            dups AS (
              SELECT (SELECT m FROM mx)
                       + row_number() OVER (ORDER BY event_id) AS event_id,
                     ts, user_id, event_type,
                     value + 37.5 AS value, props
              FROM base WHERE hash(CAST(event_id AS VARCHAR) || 'tie')
                               % {TIE_RATE} = 0
            )
            SELECT * FROM base UNION ALL SELECT * FROM dups
            """
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
    return out_dir


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", default="/root/testdata/sf0.001")
    p.add_argument("--names", nargs="*", default=None)
    p.add_argument(
        "--axis",
        choices=["values", "skew", "combined", "both", "all"],
        default="values",
        help="values = the 4-axis value-mutation corpus (r11/r12); "
        "skew = the r13 degenerate-shape corpus; combined = the value "
        "mutations applied ON TOP of the skew corpus (axis "
        "interactions: hot-key x NULLs, identical-docs x Unicode, "
        "single-day x ts extremes); both = values+skew; all = all 3",
    )
    p.add_argument(
        "--round",
        type=int,
        default=None,
        help="write ADVERSARIAL_r{N}.json at the repo root",
    )
    args = p.parse_args()

    def build_combined_dir(base: str, out_dir: str) -> str:
        skew_tmp = os.path.join(
            tempfile.gettempdir(), "spark_graft_skew_base"
        )
        shutil.rmtree(skew_tmp, ignore_errors=True)
        build_skew_dir(base, skew_tmp)
        return build_adversarial_dir(skew_tmp, out_dir)

    corpora = []
    if args.axis in ("values", "both", "all"):
        corpora.append(("values", build_adversarial_dir,
                        "spark_graft_adversarial"))
    if args.axis in ("skew", "both", "all"):
        corpora.append(("skew", build_skew_dir, "spark_graft_skew"))
    if args.axis in ("combined", "all"):
        corpora.append(("combined", build_combined_dir,
                        "spark_graft_combined"))

    from steam_data_pipeline_spark.difftest import run_all
    from steam_data_pipeline_spark.session import get_spark

    spark = get_spark("adversarial-sweep")
    per_axis: dict[str, list] = {}
    for axis, builder, dirname in corpora:
        out_dir = os.path.join(tempfile.gettempdir(), dirname)
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        builder(args.base, out_dir)
        print(f"# {axis} corpus at {out_dir} ({time.time() - t0:.1f} s)")
        t0 = time.time()
        results = run_all(spark, out_dir, names=args.names)
        per_axis[axis] = results
        n_pass = sum(r.ok for r in results)
        print(
            f"[{axis}] {n_pass}/{len(results)} pass "
            f"({len(results) - n_pass} findings) in {time.time() - t0:.1f} s"
        )
        for r in results:
            if not r.ok:
                print(f"[FINDING:{axis}] {r}")
    if args.round is not None:
        import json

        all_results = [r for rs in per_axis.values() for r in rs]
        out = {
            "round": args.round,
            "base": args.base,
            "null_rate": f"1/{NULL_RATE}",
            "tie_rate": f"1/{TIE_RATE}",
            "axes": [
                "nulls", "null_fks", "ts_ties", "empty_strings",
                "empty_vectors", "unicode_multibyte", "numeric_extremes",
                "timestamp_extremes", "malformed_json", "skew_degenerate",
                "combined_skew_x_values",
            ],
            "axes_run": sorted(per_axis),
            "n": len(all_results),
            "n_pass": sum(r.ok for r in all_results),
            "per_axis": {
                axis: {
                    "n": len(rs),
                    "n_pass": sum(r.ok for r in rs),
                }
                for axis, rs in per_axis.items()
            },
            "findings": {
                f"{axis}:{r.name}": r.issues[:3]
                for axis, rs in per_axis.items()
                for r in rs
                if not r.ok
            },
        }
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"ADVERSARIAL_r{args.round:02d}.json",
        )
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"-> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
