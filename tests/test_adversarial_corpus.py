"""Regression pins for the round-11 adversarial NULL+ties sweep.

tools/adversarial_sweep.py found 57 real findings the pristine fixtures
could never show (they contain no NULLs and no (user_id, ts) ties
anywhere). The full sweep is a committed tool + artifact
(ADVERSARIAL_r{N}.json); this test keeps a FAST representative subset
of the fixed queries running against the derived corpus in every suite
run — one query per fix family:

* NULL-flag island merge        -> win_islands
* engine-opposite NULL ordering -> win_pctrank_cumedist,
                                   agg_percentiles_exact
* DuckDB LEAST-skips-NULL bin   -> qa_psi_drift
* collect_list NULL skew (map)  -> win_resample_ffill
* NULL group key in recursion   -> llm_seq_pack
* null-safe SCD change test     -> dim_scd2_history
* NULL-text shingle identity    -> llm_dedup_jaccard
* asof row-pick (NULL value)    -> join_asof_backward
* ANSI divide / sqrt(negative)  -> agg_corr_price_players

Round-12 extremes/Unicode families (tools/adversarial_sweep.py axes
(a)/(b); 62 numeric findings + 1 Unicode, all fixed both-leg under
the numeric-domain contract):

* try_cents / Inf->BIGINT cents fold     -> agg_lorenz_deciles
* decimal(18,s) try_cast money domain    -> join_dim_fact
* DECIMAL(38,0)/HUGEINT scaled products  -> feat_target_encode_loo,
                                            feat_ols_normal_eq
* finite sketch domain (bin width inf)   -> qa_ks_drift
* NULL-cents rows leave order spines     -> qa_outlier_mad
* unquantizable-vector ingestion drop    -> llm_embedding_pca
* cents-canonical checksum strings       -> qa_table_checksum
* exact-integer 9-dp tie rounding        -> llm_embedding_centroid
* Python fold domain (fsum/int(inf))     -> udaf_fsum_value,
                                            udtf_forecast
* byte-level editdist (Unicode axis)     -> llm_dedup_editdist

Round-12 timestamp-extremes families (axis (d)):

* negative-epoch floor-vs-truncate       -> fn_datetime_suite
* NULL-cents days leave fitted series    -> udtf_forecast_hw
* operational time domain / dense fill   -> win_gap_fill_interpolate
"""

from __future__ import annotations

import os
import shutil

import pytest

from steam_data_pipeline_spark.difftest import duckdb_connect, run_one
from tests.conftest import SF_SMOKE

QUERIES = [
    "win_islands",
    "win_pctrank_cumedist",
    "agg_percentiles_exact",
    "qa_psi_drift",
    "win_resample_ffill",
    "llm_seq_pack",
    "dim_scd2_history",
    "llm_dedup_jaccard",
    "join_asof_backward",
    "agg_corr_price_players",
    # round-12 extremes/Unicode fix families
    "agg_lorenz_deciles",
    "join_dim_fact",
    "feat_target_encode_loo",
    "feat_ols_normal_eq",
    "qa_ks_drift",
    "qa_outlier_mad",
    "llm_embedding_pca",
    "qa_table_checksum",
    "llm_embedding_centroid",
    "udaf_fsum_value",
    "udtf_forecast",
    "llm_dedup_editdist",
    # round-12 ts-extremes fix families (streaming ones stay in the
    # full sweep — a stream query costs ~3 s of machinery per run)
    "fn_datetime_suite",
    "udtf_forecast_hw",
    "win_gap_fill_interpolate",
    # round-13 beyond-wall ts families (pandas-path operational time
    # domain: grouped-map fold, cogrouped asof, recursive debounce;
    # the exact-nano interpolation rides win_gap_fill_interpolate and
    # the clamped stream fixtures stay in the full sweep)
    "win_ewma_recursive",
    "join_asof_cogrouped",
    "win_debounce",
    # round-13 malformed-JSON axis (f) fix families: FAILFAST variant
    # parse, json-extract casts on out-of-BIGINT / non-numeric fields,
    # DuckDB-side json_valid guard for truncated objects
    "proj_variant_props",
    "proj_flatten_details",
    # (agg_corr_price_players, also a JSON-cast fix, is already
    # pinned in the round-11 block above)
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    from tools.adversarial_sweep import build_adversarial_dir

    d = str(tmp_path_factory.mktemp("adv_sf"))
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return build_adversarial_dir(SF_SMOKE, d)


@pytest.fixture(scope="module")
def adv_con(adv_dir):
    return duckdb_connect(adv_dir)


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_corpus_hash_exact(spark, adv_dir, adv_con, name):
    r = run_one(spark, adv_con, adv_dir, name)
    assert r.ok, (name, r.issues)


def test_ts_axis_reaches_contract_edge_and_beyond_wall(adv_dir, adv_con):
    """r13: the ts-extremes axis must actually LAND its four probe
    values in the corpus — the beyond-ns-wall far future (2500), the
    pre-epoch value, and both [1970, 2100) contract-edge instants.
    Guards the residue arithmetic (the r12 ADVICE found residue 5
    silently swallowed by the NULL class on o_orderdate)."""
    evs = {
        str(r[0])
        for r in adv_con.execute(
            "SELECT DISTINCT ts FROM "
            f"'{adv_dir}/events.parquet' WHERE ts < TIMESTAMP '1970-01-01'"
            " OR ts >= TIMESTAMP '2099-01-01'"
        ).fetchall()
    }
    assert "2500-06-15 12:34:56.789012" in evs
    assert "1905-03-14 01:02:03.000042" in evs
    assert "2099-12-31 23:59:59.999999" in evs
    assert "2100-01-01 00:00:00" in evs
    ods = {
        str(r[0])
        for r in adv_con.execute(
            "SELECT DISTINCT o_orderdate FROM "
            f"'{adv_dir}/orders.parquet' WHERE o_orderdate IS NOT NULL AND ("
            "o_orderdate < TIMESTAMP '1970-01-01'"
            " OR o_orderdate >= TIMESTAMP '2099-01-01')"
        ).fetchall()
    }
    assert "2500-11-30 00:00:00" in ods
    assert "1905-06-15 00:00:00" in ods, (
        "pre-epoch rows must survive the NULL branch (residue 6)"
    )
    assert "2100-01-01 00:00:00" in ods
