"""Round-8 operator properties: semantic invariants the oracle hash-match
cannot express (it proves cross-engine equality, not that the math means
what the docstring claims). Mirrors the round-6/7 property files.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
    ENT_BUCKET,
    events_psi_drift,
    events_user_entropy,
    orders_gap_fill_forward,
)
from realtime_twitter_trends_analytics_spark.operators.relational_ext import (
    part_price_slope,
)
from realtime_twitter_trends_analytics_spark.operators.textstats import (
    docs_vocab_coverage_curve,
)
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table


def test_entropy_bounds_and_user_conservation(spark, sf_dir):
    """Shannon entropy of a T-type mix lies in [0, ln T]; every user lands
    in exactly one bucket."""
    rows = events_user_entropy(spark, sf_dir).collect()
    n_types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    hi = math.log(n_types)
    for r in rows:
        # bucket is floor(entropy * ENT_BUCKET); the mix can't beat ln T
        assert 0 <= r["bucket"] <= int(hi * ENT_BUCKET)
        assert 0.0 <= r["mean_entropy"] <= hi + 1e-9
        assert 1 <= r["avg_types"] <= n_types


def test_psi_nonnegative_and_matches_python_mirror(spark, sf_dir):
    """PSI is a sum of (p-q)ln(p/q) terms, each >= 0, so every day's PSI
    is >= 0 (up to the 1e-9 term quantization); and the engine value must
    reproduce a pure-Python recomputation of the same Laplace-smoothed
    formula from raw counts. (At sf0.001 a day holds only ~30 events
    across ~20 bins, so absolute PSI values are sampling-inflated — the
    invariant is the math, not a small-PSI band.)"""
    import collections
    import math as m

    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        PSI_BINS,
        PSI_BIN_W,
        PSI_SCALE,
    )

    rows = events_psi_drift(spark, sf_dir).collect()
    assert rows, "corpus spans at least one day"
    for r in rows:
        assert r["psi"] >= -1e-6, r

    ev = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(ts AS DATE)").alias("day"),
        F.expr(f"CAST(floor(value / {PSI_BIN_W}) AS BIGINT)").alias("b"),
    ).collect()
    daily = collections.Counter((r["day"], r["b"]) for r in ev)
    corpus = collections.Counter(r["b"] for r in ev)
    day_tot = collections.Counter(r["day"] for r in ev)
    nq = len(ev)
    for row in rows:
        day, nd = row["day"], day_tot[row["day"]]
        assert row["n_events"] == nd
        acc = 0
        for b, cq in corpus.items():
            p = (daily.get((day, b), 0) + 1) / (nd + PSI_BINS)
            q = (cq + 1) / (nq + PSI_BINS)
            acc += m.floor((p - q) * m.log(p / q) * PSI_SCALE)
        assert abs(row["psi"] - round(acc / PSI_SCALE, 6)) < 1e-9, (day, row["psi"])


def test_gap_fill_conservation_and_fill_accounting(spark, sf_dir):
    """days_total = spine length for every priority; observed + filled +
    leading-unfilled = total; observed cents match the raw daily agg."""
    rows = {r["pr"]: r.asDict() for r in orders_gap_fill_forward(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    d0, d1 = o.agg(
        F.expr("MIN(CAST(o_orderdate AS DATE))"), F.expr("MAX(CAST(o_orderdate AS DATE))")
    ).first()
    spine_days = (d1 - d0).days + 1
    raw = {
        r["pr"]: r["cents"]
        for r in o.groupBy(F.col("o_orderpriority").alias("pr"))
        .agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("cents"))
        .collect()
    }
    assert set(rows) == set(raw)
    for pr, r in rows.items():
        assert r["days_total"] == spine_days
        assert r["observed_cents"] == raw[pr]
        assert r["days_observed"] + r["days_filled"] <= r["days_total"]
        # forward fill only adds mass: filled total >= observed total
        assert r["filled_total_cents"] >= r["observed_cents"]


def test_price_slope_matches_numpy(spark, sf_dir):
    """The fixed-point slope/r2 must reproduce numpy's polyfit per brand
    (to the 1e-6 rounding the operator declares)."""
    import numpy as np

    got = {r["brand"]: r.asDict() for r in part_price_slope(spark, sf_dir).collect()}
    p = load_table(spark, sf_dir, "part").select("p_brand", "p_size", "p_retailprice").collect()
    by_brand: dict[str, list[tuple[int, int]]] = {}
    for r in p:
        by_brand.setdefault(r["p_brand"], []).append(
            (r["p_size"], round(r["p_retailprice"] * 100))
        )
    for brand, pts in by_brand.items():
        x = np.array([a for a, _ in pts], dtype=float)
        y = np.array([b for _, b in pts], dtype=float)
        if np.var(x) == 0:
            assert got[brand]["slope_cents_per_size"] is None
            continue
        slope = np.polyfit(x, y, 1)[0]
        assert abs(got[brand]["slope_cents_per_size"] - slope) < 5e-6 * max(1, abs(slope)) + 1e-5
        r = np.corrcoef(x, y)[0, 1]
        assert abs(got[brand]["r2"] - r * r) < 1e-5


def test_bot_regularity_mirror_and_conservation(spark, sf_dir):
    """Verdict counts must reproduce a pure-Python recomputation of the
    per-user gap CV from raw (user, epoch-second) rows, and every user
    with at least one gap lands in exactly one class."""
    import collections
    import math as m

    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        BOT_CV_Q,
        BOT_CV_THRESHOLD,
        BOT_MIN_EVENTS,
        events_bot_regularity,
    )

    rows = events_bot_regularity(spark, sf_dir).collect()
    got = collections.Counter()
    for r in rows:
        got[r["verdict"]] += r["n_users"]
        assert r["mean_cv"] >= 0
        # bucket is the decile of the quantized cv — consistent with class
        if r["verdict"] == "botlike":
            assert r["cv_bucket"] * 1000 < 2500 + 1000
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr("CAST(unix_timestamp(ts) AS BIGINT)").alias("sec"), "event_id")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    by_user = collections.defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r["sec"])
    want = collections.Counter()
    for secs in by_user.values():
        gaps = [b - a for a, b in zip(secs, secs[1:])]
        if not gaps:
            continue
        n, s, ss = len(gaps), sum(gaps), sum(g * g for g in gaps)
        cv_q = 0 if s == 0 else m.floor(m.sqrt(float(n * ss - s * s)) / s * BOT_CV_Q)
        want[
            "lowactivity"
            if n < BOT_MIN_EVENTS
            else ("botlike" if cv_q < BOT_CV_THRESHOLD else "human")
        ] += 1
    assert dict(got) == dict(want)


def test_abc_migration_conserves_parts(spark, sf_dir):
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        part_abc_migration,
    )

    rows = part_abc_migration(spark, sf_dir).collect()
    classes = {"A", "B", "C", "N"}
    for r in rows:
        assert r["from_class"] in classes and r["to_class"] in classes
        assert not (r["from_class"] == "N" and r["to_class"] == "N")
        assert r["n_parts"] >= 1
    total = sum(r["n_parts"] for r in rows)
    n_parts_overall = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    # every part shipped in either half appears in exactly one cell
    assert total == n_parts_overall


def test_holt_matches_python_recurrence(spark, sf_dir):
    """The engine's Holt level/trend must reproduce a pure-Python run of
    the same recurrence over each type's day-ordered counts."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        HOLT_H,
        events_holt_forecast,
    )

    got = {r["event_type"]: r.asDict() for r in events_holt_forecast(spark, sf_dir).collect()}
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[float]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(float(r["c"]))
    import math as m

    def q4(v):
        return m.floor(v * 10000) / 10000.0

    for t, xs in series.items():
        if len(xs) < 2:
            assert t not in got
            continue
        level, b = xs[1], xs[1] - xs[0]
        for x in xs[2:]:
            lnew = 0.3 * x + 0.7 * (level + b)
            b = 0.1 * (lnew - level) + 0.9 * b
            level = lnew
        assert got[t]["n_days"] == len(xs)
        assert got[t]["level"] == q4(level)
        assert got[t]["trend"] == q4(b)
        assert got[t][f"forecast_{HOLT_H}d"] == q4(level + HOLT_H * b)


def test_kcenter_greedy_properties_and_python_mirror(spark, sf_dir):
    """Farthest-point greedy invariants: picks are distinct, the max-sim
    at pick time is NON-DECREASING (each pick is the farthest remaining
    point, so the frontier can only close in), and the whole trajectory
    reproduces a pure-Python greedy over the same quantized cosines."""
    import math as m

    from realtime_twitter_trends_analytics_spark.operators.similarity import (
        KCENTER_K,
        MMR_SCALE,
        sim_kcenter_select,
    )

    rows = sorted(sim_kcenter_select(spark, sf_dir).collect(), key=lambda r: r["step"])
    assert [r["step"] for r in rows] == list(range(1, KCENTER_K + 1))
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == KCENTER_K
    sims = [r["max_sim_at_pick"] for r in rows[1:]]
    assert sims == sorted(sims)

    emb = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def qcos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = m.sqrt(sum(x * x for x in a))
        nb = m.sqrt(sum(y * y for y in b))
        return m.floor(dot / (na * nb) * MMR_SCALE)

    sel = [0]
    ms = {v: qcos(emb[v], emb[0]) for v in emb if v != 0}
    trajectory = [(1, 0, None)]
    for step in range(2, KCENTER_K + 1):
        pick = min(ms, key=lambda v: (ms[v], v))
        trajectory.append((step, pick, ms[pick] / float(MMR_SCALE)))
        sel.append(pick)
        del ms[pick]
        for v in ms:
            ms[v] = max(ms[v], qcos(emb[v], emb[pick]))
    got = [(r["step"], r["vec_id"], r["max_sim_at_pick"]) for r in rows]
    assert got == trajectory


def test_k_anonymity_conserves_events(spark, sf_dir):
    from realtime_twitter_trends_analytics_spark.operators.quality import (
        KANON_K,
        events_k_anonymity,
    )

    rows = {r["verdict"]: r.asDict() for r in events_k_anonymity(spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows.values()) == total
    if "at_risk" in rows:
        assert rows["at_risk"]["max_class_size"] < KANON_K
    if "anonymous" in rows:
        assert rows["anonymous"]["min_class_size"] >= KANON_K


def test_dp_counts_noise_behaves_like_laplace(spark, sf_dir):
    """The seeded release must (a) move every type's total (noise is
    continuous, an exact-zero total shift over many days is measure-zero),
    (b) have mean absolute per-cell error in a loose band around the
    Laplace scale b=2 (E|noise| = b), and (c) never change the TRUE side."""
    from realtime_twitter_trends_analytics_spark.operators.quality import (
        DP_EPSILON_INV,
        events_dp_counts,
    )

    rows = events_dp_counts(spark, sf_dir).collect()
    true_daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want_true = {r["event_type"]: r["n"] for r in true_daily}
    total_cells = sum(r["n_days"] for r in rows)
    total_l1 = sum(r["l1_error"] for r in rows)
    for r in rows:
        assert r["true_total"] == want_true[r["event_type"]]
        assert r["l1_error"] >= 0
    # mean per-cell |error|: floor() adds up to 1 of downward bias on top
    # of E|Laplace(2)| = 2 -> band [0.5, 6] is generous but excludes both
    # a broken (zero-noise) and a runaway mechanism
    assert 0.5 <= total_l1 / total_cells <= 6.0, total_l1 / total_cells


def test_coverage_curve_monotone_and_bounded(spark, sf_dir):
    rows = sorted(docs_vocab_coverage_curve(spark, sf_dir).collect(), key=lambda r: r["k"])
    assert rows, "at least one cut within vocabulary"
    prev = 0.0
    for r in rows:
        assert 0.0 < r["coverage"] <= 1.0
        assert r["coverage"] >= prev  # more head types can only cover more
        prev = r["coverage"]
        assert r["cum_occurrences"] <= r["total_occurrences"]
        assert r["k"] <= r["vocab_size"]  # a cut past the vocab emits no row
