"""Independent NumPy/pandas reference checks for the round-8 stats
queries. The DuckDB oracles prove ENGINE equivalence; these prove the
FORMULAS — each query recomputed from the raw fixture with a different
algorithm/library (sequential PAVA vs the minimax identity, pandas
rolling vs RANGE windows, ...), so a bug present in both the Spark and
the SQL expression of the same identity still fails here."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from steam_data_pipeline_spark.plans.registry import QUERIES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_pdf():
    df = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    df["cents"] = np.round(df["value"] * 100).astype("int64")
    return df


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet(f"{SF_SMOKE}/documents.parquet")


def _daily(events_pdf):
    p = events_pdf[events_pdf.event_type == "purchase"]
    return (
        p.groupby(p.ts.values.astype("datetime64[D]"))["cents"]
        .sum()
        .sort_index()
    )


def _per_user(events_pdf):
    g = events_pdf.groupby("user_id")
    x = (
        events_pdf[events_pdf.event_type == "purchase"]
        .groupby("user_id")["cents"]
        .sum()
    )
    out = pd.DataFrame({"n_ev": g.size()})
    out["x"] = x.reindex(out.index).fillna(0).astype("int64")
    return out


class TestStatsAgainstNumpy:
    def test_theil_sen_vs_numpy(self, spark, events_pdf):
        d = _daily(events_pdf)
        days = (d.index - d.index[0]).days.values
        vals = d.values.astype(float)
        slopes = [
            (vals[j] - vals[i]) / (days[j] - days[i])
            for i in range(len(vals))
            for j in range(i + 1, len(vals))
        ]
        slopes.sort()
        lower_median = slopes[(len(slopes) + 1) // 2 - 1]
        row = QUERIES["win_theil_sen"].spark(spark, SF_SMOKE).collect()[0]
        assert row.n_pairs == len(slopes)
        assert row.sen_slope_cents_per_day == pytest.approx(
            lower_median, abs=1e-6
        )

    def test_mann_kendall_vs_numpy(self, spark, events_pdf):
        v = _daily(events_pdf).values
        n = len(v)
        s = sum(
            np.sign(v[j] - v[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        _, tf = np.unique(v, return_counts=True)
        tie = sum(t * (t - 1) * (2 * t + 5) for t in tf if t > 1)
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        corrected = s - np.sign(s) if s != 0 else 0
        row = QUERIES["agg_mann_kendall"].spark(spark, SF_SMOKE).collect()[0]
        assert row.s_stat == s
        assert row.z_mk == pytest.approx(corrected / np.sqrt(var), abs=1e-6)

    def test_welch_t_vs_numpy(self, spark, events_pdf):
        u = _per_user(events_pdf)
        a = u.x[u.index % 2 == 0].values.astype(float)
        b = u.x[u.index % 2 == 1].values.astype(float)
        vm0 = a.var(ddof=1) / len(a)
        vm1 = b.var(ddof=1) / len(b)
        t_ref = (b.mean() - a.mean()) / np.sqrt(vm0 + vm1)
        df_ref = (vm0 + vm1) ** 2 / (
            vm0**2 / (len(a) - 1) + vm1**2 / (len(b) - 1)
        )
        row = QUERIES["agg_ttest_welch"].spark(spark, SF_SMOKE).collect()[0]
        assert row.t_stat == pytest.approx(t_ref, abs=1e-6)
        assert row.df_welch == pytest.approx(df_ref, rel=1e-9)

    def test_cuped_vs_numpy(self, spark, events_pdf):
        p = events_pdf[events_pdf.event_type == "purchase"]
        split = np.datetime64("2024-01-16")
        pre = p[p.ts.values < split].groupby("user_id")["cents"].sum()
        post = p[p.ts.values >= split].groupby("user_id")["cents"].sum()
        users = events_pdf.user_id.unique()
        pre = pre.reindex(users).fillna(0).values.astype(float)
        post = post.reindex(users).fillna(0).values.astype(float)
        theta = np.cov(pre, post, ddof=0)[0, 1] / pre.var(ddof=0)
        rows = {
            r.variant: r
            for r in QUERIES["feat_cuped_adjust"].spark(spark, SF_SMOKE).collect()
        }
        for var in (0, 1):
            mask = users % 2 == var
            adj = post[mask].mean() - theta * (
                pre[mask].mean() - pre.mean()
            )
            assert rows[var].theta == pytest.approx(theta, abs=1e-6)
            assert rows[var].mean_cuped_cents == pytest.approx(adj, abs=1e-4)

    def test_delta_method_vs_numpy(self, spark, events_pdf):
        u = _per_user(events_pdf)
        rows = {
            r.variant: r
            for r in QUERIES["agg_delta_method_ci"].spark(spark, SF_SMOKE).collect()
        }
        for var in (0, 1):
            sub = u[u.index % 2 == var]
            x = sub.x.values.astype(float)
            nv = sub.n_ev.values.astype(float)
            n = len(sub)
            r = x.sum() / nv.sum()
            var_r = (
                x.var(ddof=1)
                - 2 * r * np.cov(x, nv, ddof=1)[0, 1]
                + r * r * nv.var(ddof=1)
            ) / (n * nv.mean() ** 2)
            assert rows[var].ratio_cents_per_event == pytest.approx(r, abs=1e-6)
            assert rows[var].se == pytest.approx(np.sqrt(var_r), abs=1e-6)

    def test_power_mde_vs_numpy(self, spark, events_pdf):
        u = _per_user(events_pdf)
        x = u.x.values.astype(float)
        sd = x.std(ddof=1)
        mde = (1.96 + 0.8416) * np.sqrt(2 * sd * sd / (len(x) // 2))
        row = QUERIES["agg_power_mde"].spark(spark, SF_SMOKE).collect()[0]
        assert row.sd_cents == pytest.approx(sd, abs=1e-4)
        assert row.mde_cents == pytest.approx(mde, abs=1e-4)

    def test_winsorized_mean_vs_numpy(self, spark, events_pdf):
        got = {
            r.event_type: r
            for r in QUERIES["agg_winsorized_mean"].spark(spark, SF_SMOKE).collect()
        }
        for et, sub in events_pdf.groupby("event_type"):
            c = np.sort(sub.cents.values)
            n = len(c)
            # percentile_disc: smallest value with cum >= q*n
            lo = c[int(np.ceil(0.05 * n)) - 1]
            hi = c[int(np.ceil(0.95 * n)) - 1]
            ref = np.clip(c, lo, hi).mean()
            assert got[et].lo_cents == lo
            assert got[et].hi_cents == hi
            assert got[et].winsorized_mean_cents == pytest.approx(ref, abs=1e-6)

    def test_bollinger_vs_pandas(self, spark, events_pdf):
        d = _daily(events_pdf)
        s = pd.Series(d.values.astype(float), index=pd.DatetimeIndex(d.index))
        roll = s.rolling("7D")
        mid = roll.mean()
        sd = roll.std(ddof=0)
        rows = sorted(
            QUERIES["win_bollinger_bands"].spark(spark, SF_SMOKE).collect(),
            key=lambda r: r.day,
        )
        assert len(rows) == len(s)
        for row, m, sdev in zip(rows, mid.values, sd.values):
            assert row.mid == pytest.approx(m, abs=1e-3)
            assert row.upper == pytest.approx(m + 2 * sdev, abs=1e-3)

    def test_forecast_ar2_vs_numpy(self, spark, events_pdf):
        v = _daily(events_pdf).values.astype(float)
        n = len(v)
        m = v.mean()
        dv = v - m
        a0 = (dv * dv).sum()
        a1 = (dv[1:] * dv[:-1]).sum()
        a2 = (dv[2:] * dv[:-2]).sum()
        r1, r2 = a1 / a0, a2 / a0
        phi1 = r1 * (1 - r2) / (1 - r1 * r1)
        phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
        f = [dv[-2], dv[-1]]
        for _ in range(7):
            f.append(phi1 * f[-1] + phi2 * f[-2])
        rows = sorted(
            QUERIES["win_forecast_ar2"].spark(spark, SF_SMOKE).collect(),
            key=lambda r: r.h,
        )
        assert rows[0].phi1 == pytest.approx(phi1, abs=1e-6)
        assert rows[0].phi2 == pytest.approx(phi2, abs=1e-6)
        for h, row in enumerate(rows, start=1):
            assert row.forecast_cents == pytest.approx(m + f[1 + h], abs=1e-2)

    def test_isotonic_vs_sequential_pava(self, spark, docs_pdf):
        """The minimax identity must equal the classical sequential
        pool-adjacent-violators algorithm — two different algorithms,
        same projection."""
        b = np.minimum(19, docs_pdf.n_chars.values // 50)
        y = (docs_pdf.lang == "en").values.astype(float)
        bins = sorted(set(b))
        w = np.array([float((b == k).sum()) for k in bins])
        s = np.array([float(y[b == k].sum()) for k in bins])
        # sequential PAVA with weights
        blocks = [[s[i] / w[i], w[i], [i]] for i in range(len(bins))]
        out, i = [], 0
        for blk in blocks:
            out.append(blk)
            while len(out) >= 2 and out[-2][0] >= out[-1][0]:
                m2, w2, idx2 = out.pop()
                m1, w1, idx1 = out.pop()
                wt = w1 + w2
                out.append([(m1 * w1 + m2 * w2) / wt, wt, idx1 + idx2])
        iso = np.empty(len(bins))
        for mval, _, idxs in out:
            for i in idxs:
                iso[i] = mval
        got = {
            r.bin: r
            for r in QUERIES["feat_isotonic_calibrate"].spark(spark, SF_SMOKE).collect()
        }
        assert sorted(got) == bins
        for k, ref in zip(bins, iso):
            assert got[k].iso_rate == pytest.approx(ref, abs=1e-6), k
        # and the output is monotone non-decreasing
        vals = [got[k].iso_rate for k in bins]
        assert all(x <= y_ for x, y_ in zip(vals, vals[1:]))

    def test_backtest_ar1_vs_loop_refit(self, spark, events_pdf):
        """Each origin's window-prefix AR(1) fit must equal an actual
        per-origin numpy refit on the prefix — the loop the query
        eliminates."""
        v = _daily(events_pdf).values.astype(float)
        n = len(v)
        refs = {}
        for t in range(max(8, n - 10), n):
            x = v[:t]
            m = x.mean()
            dv = x - m
            phi = (dv[1:] * dv[:-1]).sum() / (dv * dv).sum()
            refs[t] = round(m + phi * (x[-1] - m), 3)
        rows = sorted(
            QUERIES["win_backtest_ar1"].spark(spark, SF_SMOKE).collect(),
            key=lambda r: r.origin_day,
        )
        assert len(rows) == len(refs)
        errs = []
        for (t, ref), row in zip(sorted(refs.items()), rows):
            assert row.forecast_cents == pytest.approx(ref, abs=1e-2), t
            assert row.actual_cents == v[t]
            errs.append(abs(row.forecast_cents - row.actual_cents))
        mae_ref = np.mean(np.round(errs, 3))
        assert rows[0].mae == pytest.approx(mae_ref, abs=1e-3)

    def test_hill_tail_index_vs_numpy(self, spark):
        o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
        cents = np.round(o.o_totalprice.values * 100).astype("int64")
        k = 200
        top = np.sort(cents)[-k:]
        x_k = top[0]
        # match the query's rounding discipline: ln rounded to 9 first
        hill = (np.round(np.log(top), 9) - np.round(np.log(x_k), 9)).sum() / k
        row = QUERIES["agg_hill_tail_index"].spark(spark, SF_SMOKE).collect()[0]
        assert row.k == k and row.x_k_cents == x_k
        assert row.hill == pytest.approx(hill, abs=1e-6)
        assert row.alpha == pytest.approx(k / (hill * k), rel=1e-6)

    def test_holt_winters_vs_reference_loop(self, spark, events_pdf):
        """HW forecasts re-derived from the raw fixture by an
        independent loop (pandas groupby, textbook formulas)."""
        g = events_pdf.groupby(
            ["event_type", events_pdf.ts.values.astype("datetime64[D]")]
        )["cents"].sum()
        rows = QUERIES["udtf_forecast_hw"].spark(spark, SF_SMOKE).collect()
        got = {(r.event_type, r.h): r.forecast_cents for r in rows}
        n_types = 0
        for et in events_pdf.event_type.unique():
            x = g.loc[et].sort_index().values.astype("int64")
            if len(x) < 15:
                assert not any(k[0] == et for k in got)
                continue
            n_types += 1
            lv = x[:7].sum() / 7.0
            tr = (x[7:14].sum() / 7.0 - x[:7].sum() / 7.0) / 7.0
            s = [x[i] - lv for i in range(7)]
            for t in range(7, len(x)):
                lp, tp = lv, tr
                lv = 0.3 * (x[t] - s[0]) + 0.7 * (lp + tp)
                tr = 0.1 * (lv - lp) + 0.9 * tp
                s = s[1:] + [0.2 * (x[t] - lv) + 0.8 * s[0]]
            for h in range(1, 8):
                assert got[(et, h)] == pytest.approx(
                    lv + h * tr + s[h - 1], abs=1e-2
                ), (et, h)
        assert n_types == len({k[0] for k in got})


class TestAssocRulesReference:
    def test_known_baskets_lift(self, spark, tmp_path):
        """Hand-built baskets with known co-occurrence: verify
        support / confidence / lift against arithmetic done by hand
        (pruning thresholds lowered by shrinking the fixture is not
        possible, so items are replicated past min_support=25)."""
        import pandas as pd

        # 30 baskets contain {1, 2}; 10 contain {1, 3}; 25 contain {3}
        rows = []
        for bid in range(30):
            rows += [(bid, 1), (bid, 2)]
        for bid in range(30, 40):
            rows += [(bid, 1), (bid, 3)]
        for bid in range(40, 65):
            rows += [(bid, 3)]
        # item 4: 10 baskets, ALWAYS with item 1 — heavy co-occurrence
        # but below min_item_support=25, so apriori pruning must drop
        # it before any pair forms
        for bid in range(30, 40):
            rows += [(bid, 4)]
        pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
        d = str(tmp_path / "li")
        import os

        os.makedirs(d)
        pdf.to_parquet(f"{d}/lineitem.parquet", index=False)
        from steam_data_pipeline_spark.plans.registry import QUERIES as Q

        out = {
            (r.item_a, r.item_b): r
            for r in Q["agg_assoc_rules"].spark(spark, d).collect()
        }
        # item counts: 1 -> 40, 2 -> 30, 3 -> 35; n_baskets = 65
        r12 = out[(1, 2)]
        assert r12.pair_count == 30
        assert r12.support == round(30 / 65, 9)
        assert r12.conf_a_to_b == round(30 / 40, 9)
        assert r12.conf_b_to_a == 1.0
        assert r12.lift == round(65 * 30 / (40 * 30), 9)
        r13 = out[(1, 3)]
        assert r13.pair_count == 10
        assert r13.lift == round(65 * 10 / (40 * 35), 9)
        assert (2, 3) not in out  # never co-occur
        assert not any(4 in k for k in out)  # infrequent item pruned


class TestFdrBhReference:
    def test_erfc_approx_vs_math(self):
        """The A&S 7.1.26 rational erfc used by agg_fdr_bh must stay
        within its published 1.5e-7 bound of math.erfc across the
        z range the battery can emit."""
        import math

        def p_two(z):
            x = abs(z) / 1.4142135623730951
            t = 1.0 / (1.0 + 0.3275911 * x)
            poly = t * (
                0.254829592
                + t
                * (
                    -0.284496736
                    + t
                    * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
                )
            )
            return poly * math.exp(-x * x)

        for z in np.linspace(0.0, 6.0, 601):
            assert abs(p_two(z) - math.erfc(z / math.sqrt(2))) < 1.5e-7

    def test_bh_stepup_vs_statsmodels_style(self, spark):
        """Recompute the BH decision from the query's own p-values
        with the canonical step-up written independently in NumPy:
        the rejected set must match exactly; p-values must be valid
        and m_tests consistent."""
        from steam_data_pipeline_spark.plans.registry import QUERIES as Q

        rows = Q["agg_fdr_bh"].spark(spark, SF_SMOKE).collect()
        m = len(rows)
        assert all(r.m_tests == m for r in rows)
        p = np.array([r.p_value for r in rows])
        order = np.lexsort(
            ([r.dow for r in rows], [r.event_type for r in rows], p)
        )
        ranked = p[order]
        hits = np.nonzero(ranked <= (np.arange(1, m + 1) * 0.10 / m))[0]
        kstar = hits.max() + 1 if hits.size else 0
        expect = np.zeros(m, dtype=int)
        expect[order[:kstar]] = 1
        got = np.array([r.rejected for r in rows])
        assert (got == expect).all()
        assert ((p >= 0) & (p <= 1)).all()


class TestPurgedSplitReference:
    def test_embargo_gap_holds(self, spark):
        """For every fold: train max_ts + 24 h <= test min_ts, purged
        rows sit strictly inside the gap, and the three splits
        partition each fold's covered range without overlap."""
        from datetime import timedelta

        from steam_data_pipeline_spark.plans.registry import QUERIES as Q

        rows = Q["feat_split_time_purged"].spark(spark, SF_SMOKE).collect()
        by = {(r.fold, r.split): r for r in rows}
        for fold in (1, 2, 3):
            tr, te = by[(fold, "train")], by[(fold, "test")]
            assert tr.max_ts + timedelta(hours=24) <= te.min_ts
            if (fold, "purged") in by:
                pu = by[(fold, "purged")]
                assert tr.max_ts < pu.min_ts <= pu.max_ts < te.min_ts
        # expanding window: each later fold trains on strictly more
        assert (
            by[(1, "train")].n_rows
            < by[(2, "train")].n_rows
            < by[(3, "train")].n_rows
        )


class TestSprtReference:
    def test_msprt_vs_numpy_and_detects_planted_effect(self, spark):
        """Recompute the mixture-SPRT trajectory independently in
        NumPy from the raw fixture (float64 throughout, same tau),
        and verify the always-valid p matches to approximation
        tolerance AND that a planted 2x revenue lift in variant 1
        drives p to significance while the null fixture stays at 1."""
        import math

        from steam_data_pipeline_spark.plans.registry import QUERIES as Q

        pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
        pdf = pdf[pdf.event_type == "purchase"].copy()
        pdf["cents"] = np.round(pdf["value"] * 100).astype("int64")
        pdf["variant"] = (pdf["user_id"] % 2).astype(int)
        pdf["day"] = pdf["ts"].values.astype("datetime64[D]")

        def msprt(frame):
            days = np.sort(frame["day"].unique())
            peak, out = -np.inf, {}
            for d in days:
                cur = frame[frame.day <= d]
                x0 = cur[cur.variant == 0]["cents"].to_numpy(float)
                x1 = cur[cur.variant == 1]["cents"].to_numpy(float)
                if len(x0) < 2 or len(x1) < 2:
                    continue
                sig2 = (
                    (len(x0) * (x0 * x0).sum() - x0.sum() ** 2) / len(x0)
                    + (len(x1) * (x1 * x1).sum() - x1.sum() ** 2) / len(x1)
                ) / (len(x0) + len(x1) - 2)
                if sig2 <= 0:
                    continue
                vv = sig2 * (len(x0) + len(x1)) / (len(x0) * len(x1))
                delta = x1.mean() - x0.mean()
                ll = 0.5 * math.log(vv / (vv + 250000.0)) + (
                    delta * delta * 250000.0 / (2.0 * vv * (vv + 250000.0))
                )
                peak = max(peak, ll)
                out[np.datetime64(d, "D")] = min(1.0, math.exp(-peak))
            return out

        got = {
            np.datetime64(r.day, "D"): r.p_always_valid
            for r in Q["win_sprt_always_valid"].spark(spark, SF_SMOKE).collect()
        }
        ref = msprt(pdf)
        assert set(got) == set(ref)
        for d in ref:
            assert abs(got[d] - ref[d]) < 1e-6, (d, got[d], ref[d])
        # planted effect: +$200/event location shift in variant 1
        # (variance-preserving, unlike a multiplicative lift)
        lifted = pdf.copy()
        lifted.loc[lifted.variant == 1, "cents"] += 20000
        ref_lift = msprt(lifted)
        assert min(ref_lift.values()) <= 0.05  # detector fires
        assert min(ref.values()) > 0.5  # and stays quiet on the null


class TestFdrBhDetection:
    def test_planted_cell_effect_rejected_alone(self, spark, tmp_path):
        """Detection power + specificity on a constructed corpus:
        values depend only on (user_id // 2, day) so the parity
        variants are IDENTICAL in every null cell (delta exactly 0,
        p = 1), and one planted cell — purchase events on dow 3 get
        +$300 for variant-1 users — must be the ONLY rejection the
        BH step-up returns."""
        import os
        from datetime import datetime, timedelta

        import pandas as pd

        rows = []
        base = datetime(2024, 1, 1)  # == the dow anchor -> day 0 is dow 0
        eid = 0
        for day in range(14):
            dow = day % 7
            for etype in ("purchase", "view"):
                for user in range(200):
                    val = float(((user // 2) * 37 + day * 13) % 100 + 1)
                    if etype == "purchase" and dow == 3 and user % 2 == 1:
                        val += 300.0
                    rows.append(
                        (eid, base + timedelta(days=day, hours=12),
                         user, etype, val)
                    )
                    eid += 1
        d = str(tmp_path / "fdr")
        os.makedirs(d)
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        ).to_parquet(f"{d}/events.parquet", index=False,
                     coerce_timestamps="us", allow_truncated_timestamps=True)
        from steam_data_pipeline_spark.plans.registry import QUERIES as Q

        got = Q["agg_fdr_bh"].spark(spark, d).collect()
        assert all(r.m_tests == 14 for r in got)
        rejected = {(r.event_type, r.dow) for r in got if r.rejected}
        assert rejected == {("purchase", 3)}
        by = {(r.event_type, r.dow): r for r in got}
        assert by[("purchase", 3)].p_value <= 0.05 / 14  # survives rank 1
        nulls = [r.p_value for r in got if (r.event_type, r.dow) != ("purchase", 3)]
        # deltas exactly zero -> z = 0 -> the A&S erfc gives
        # 0.999999999 (its |err| < 1.5e-7 at the origin), round 9
        assert all(p >= 0.999999 for p in nulls)


class TestExpandingEncodeReference:
    def test_prior_only_vs_pandas_expanding(self, spark):
        """Recompute the encoding with pandas groupby-expanding
        (shifted by one — strictly prior) and verify equality,
        including the NULL first-event-per-user rule and that no
        row's encoding uses its own or any later value."""
        from steam_data_pipeline_spark.plans.registry import QUERIES as Q

        got = {
            r.event_id: (r.prior_n, r.prior_sum_cents, r.enc_micro)
            for r in Q["feat_target_encode_expanding"]
            .spark(spark, SF_SMOKE)
            .collect()
        }
        pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
        pdf = pdf[pdf.event_type == "purchase"].copy()
        pdf["cents"] = np.round(pdf["value"] * 100).astype("int64")
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        g = pdf.groupby("user_id")["cents"]
        pdf["prior_n"] = g.cumcount()
        pdf["prior_sum"] = (g.cumsum() - pdf["cents"]).astype("int64")
        assert len(got) == len(pdf)
        for r in pdf.itertuples():
            n, s, enc = got[r.event_id]
            assert n == r.prior_n and s == r.prior_sum
            if r.prior_n == 0:
                assert enc is None
            else:
                assert enc == (r.prior_sum * 10000) // r.prior_n
