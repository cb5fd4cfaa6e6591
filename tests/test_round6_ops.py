"""Invariant + planted-fixture tests for the round-6 operators
(engine parity is covered by the oracle gate; these pin that the math
means what it claims on constructions where the right answer is known).
"""

from __future__ import annotations

import hashlib
import math

import duckdb

from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
    events_changepoint,
    stats_mannwhitney,
)
from realtime_twitter_trends_analytics_spark.operators.graph import (
    KCORE_DEN,
    KCORE_NUM,
    graph_kcore,
)
from realtime_twitter_trends_analytics_spark.operators.relational_ext import (
    market_basket_rules,
)
from realtime_twitter_trends_analytics_spark.operators.similarity import (
    TOP_K,
    sim_ann_int8_eval,
)
from realtime_twitter_trends_analytics_spark.operators.textstats import (
    docs_ngram_novelty,
)


def _round_ratio_py(num: int, den: int, digits: int = 4) -> float:
    """The repo's half-up integer-ratio rounding (dialect.round_ratio)."""
    scale = 10**digits
    return ((2 * num * scale + den) // (2 * den)) / scale


# --------------------------------------------------------------- k-core
def test_kcore_peels_planted_pendants(spark, tmp_path_factory):
    """Planted bipartite graph: a complete 4x4 core plus 2 pendant
    customers (degree 1). With 18 edges the fixed thresholds come out
    k_c = 3, k_s = 4; round 1 peels exactly the pendants, and the core
    (every degree 4) is stable — the peel must remove the pendants and
    NOTHING else."""
    out = tmp_path_factory.mktemp("kcore_sf")
    edges = [(c, s) for c in range(4) for s in range(4)]  # complete core
    edges += [(100, 0), (101, 1)]  # pendants
    orders = [(i, c) for i, (c, _) in enumerate(edges)]
    lines = [(i, s) for i, (_, s) in enumerate(edges)]
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey bigint, l_suppkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))

    # threshold sanity against the documented formula
    assert 1 + (18 * KCORE_NUM) // (6 * KCORE_DEN) == 3   # customer side
    assert 1 + (18 * KCORE_NUM) // (4 * KCORE_DEN) == 4   # supplier side

    got = {r["side"]: r.asDict() for r in graph_kcore(spark, str(out)).collect()}
    assert got["customer"]["threshold"] == 3
    assert got["supplier"]["threshold"] == 4
    for side in ("customer", "supplier"):
        assert got[side]["n_nodes"] == 4
        assert got[side]["n_edges"] == 16
        assert got[side]["min_deg"] == 4
        assert got[side]["max_deg"] == 4


# --------------------------------------------------------- market basket
def test_market_basket_metric_identities(spark, sf_dir):
    """Every emitted rule must satisfy the frequent-itemset identities on
    its own integer columns (recomputed with the exact half-up rounding —
    no tolerance): pair_n <= min(a_n, b_n) <= n_baskets, and
    support/confidence/lift are the documented integer ratios. Rules
    arrive sorted by (lift DESC, item_a, item_b)."""
    rows = [r.asDict() for r in market_basket_rules(spark, sf_dir).collect()]
    assert rows, "no rules emitted"
    for r in rows:
        assert 0 < r["pair_n"] <= min(r["a_n"], r["b_n"]) <= r["n_baskets"]
        assert r["support"] == _round_ratio_py(r["pair_n"], r["n_baskets"])
        assert r["confidence"] == _round_ratio_py(r["pair_n"], r["a_n"])
        assert r["lift"] == _round_ratio_py(
            r["pair_n"] * r["n_baskets"], r["a_n"] * r["b_n"]
        )
    key = [(-r["lift"], r["item_a"], r["item_b"]) for r in rows]
    assert key == sorted(key)


# ---------------------------------------------------------- Mann-Whitney
def test_mannwhitney_matches_pure_python(spark, sf_dir):
    """Recompute U and the tie-corrected z from scratch in Python (own
    variant assignment via hashlib md5, own average-rank tie handling)
    and require the integer columns to match EXACTLY; z may differ only
    by the display rounding grid (< 1e-4/2 half-ulp)."""
    ev = duckdb.sql(
        f"SELECT event_type, user_id, CAST(round(value * 100) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    groups: dict[str, dict[str, list[int]]] = {}
    for etype, uid, cents in ev:
        nib = int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16)
        variant = "A" if nib < 8 else "B"
        groups.setdefault(etype, {"A": [], "B": []})[variant].append(cents)

    got = {r["event_type"]: r.asDict() for r in stats_mannwhitney(spark, sf_dir).collect()}
    for etype, g in groups.items():
        a, b = g["A"], g["B"]
        if not a or not b:
            assert etype not in got
            continue
        both = sorted([(v, "A") for v in a] + [(v, "B") for v in b])
        # average ranks with ties
        r_a = 0.0
        i = 0
        while i < len(both):
            j = i
            while j < len(both) and both[j][0] == both[i][0]:
                j += 1
            avg_rank = (i + 1 + j) / 2.0
            r_a += avg_rank * sum(1 for k in range(i, j) if both[k][1] == "A")
            i = j
        na, nb, n = len(a), len(b), len(a) + len(b)
        u_a = r_a - na * (na + 1) / 2.0
        # tie term
        from collections import Counter

        t = sum(c**3 - c for c in Counter(v for v, _ in both).values())
        var = (na * nb / 12.0) * ((n + 1) - t / (n * (n - 1)))
        z = (u_a - na * nb / 2.0) / math.sqrt(var) if var > 0 else 0.0
        row = got[etype]
        assert row["n_a"] == na and row["n_b"] == nb
        assert row["u_a"] == u_a  # exact: u2_a is BIGINT, /2.0 is exact
        assert abs(row["z_mw"] - z) < 5e-5  # display rounding half-ulp


# ----------------------------------------------------------- change point
def test_changepoint_finds_planted_shift(spark, tmp_path_factory):
    """10 observed days: 1 event/day for days 1-5, then 3/day for days
    6-10. The best mean-shift split must land after day 5 with segment
    means exactly 1.0 and 3.0."""
    import datetime as dt

    out = tmp_path_factory.mktemp("cp_sf")
    rows = []
    eid = 0
    for day in range(1, 11):
        n = 1 if day <= 5 else 3
        for k in range(n):
            rows.append(
                (
                    eid,
                    dt.datetime(2025, 3, day, 12, k),
                    eid % 7,
                    "click",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {r["event_type"]: r.asDict() for r in events_changepoint(spark, str(out)).collect()}
    row = got["click"]
    assert row["split_day"] == dt.date(2025, 3, 5)
    assert row["days_before"] == 5 and row["n_days"] == 10
    assert row["mean_before"] == 1.0 and row["mean_after"] == 3.0


# --------------------------------------------------------------- novelty
def test_novelty_planted_unique_and_duplicated(spark, tmp_path_factory):
    """Two byte-identical docs share every shingle (novelty 0.0); a third
    doc with a disjoint vocabulary is fully unique (novelty 1.0)."""
    out = tmp_path_factory.mktemp("nov_sf")
    dup = "alpha beta gamma delta epsilon"
    uniq = "zeta eta theta iota kappa"
    rows = [(0, dup, "en", "s0", 30), (1, dup, "en", "s0", 30), (2, uniq, "en", "s0", 25)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = {r["doc_id"]: r.asDict() for r in docs_ngram_novelty(spark, str(out)).collect()}
    assert got[0]["novelty"] == 0.0 and got[1]["novelty"] == 0.0
    assert got[2]["novelty"] == 1.0
    assert got[2]["n_shingles"] == 3  # 5 tokens -> 3 tri-shingles


# --------------------------------------------------------------- int8 eval
def test_int8_eval_perfect_on_corpus_detects_planted_collapse(
    spark, sf_dir, tmp_path_factory
):
    """On the driver corpus int8 quantization is benign: recall_int8 must
    be 1.0 for every query (the honest measured result the operator
    reports). The eval must also DETECT degradation: a planted corpus
    where 25 candidates differ only in a second component SMALLER than
    half the int8 quantization step (all collapse to the same quantized
    vector, ties broken by cand_id, while the float ranking prefers the
    HIGHEST cand_ids) must read recall 0.0 for that query."""
    for r in sim_ann_int8_eval(spark, sf_dir).collect():
        assert r["recall_int8"] == 1.0 and r["n_hits"] == TOP_K

    out = tmp_path_factory.mktemp("int8_sf")
    dim = 64

    def vec(components: dict[int, float]) -> list[float]:
        v = [0.0] * dim
        for i, x in components.items():
            v[i] = x
        return v

    rows = [(0, vec({0: 1.0}), 0)]
    # queries 1..9: far-away directions (never in q0's top-K)
    for i in range(1, 10):
        rows.append((i, vec({i: 1.0}), 0))
    # candidates 10..34: [1, a, 0...] with a below the int8 dead zone
    # (scale = 1/127, so |a| < scale/2 ~ 0.00394 rounds to 0); larger a =
    # smaller float cosine, and a DECREASES with cand_id, so the float
    # top-10 is the LAST ten ids while the int8 tie-break picks the FIRST
    # ten -> zero overlap.
    for j, cid in enumerate(range(10, 35)):
        a = 0.0035 * (25 - j) / 25.0
        rows.append((cid, vec({0: 1.0, 1: a}), 1))
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))

    got = {r["query_id"]: r.asDict() for r in sim_ann_int8_eval(spark, str(out)).collect()}
    assert got[0]["recall_int8"] == 0.0 and got[0]["n_hits"] == 0


# ------------------------------------------------------- link prediction
def test_link_prediction_planted_path(spark, tmp_path_factory):
    """Planted co-occurrence structure: tokens a,b always co-occur and
    b,c always co-occur, but a,c co-occur below the 60% edge support —
    the path graph a-b-c. The only wedge is (a, c) through b, so link
    prediction must propose exactly (a, c) with cn=1, deg 1 and 1,
    Jaccard 1.0 (union = {b})."""
    from realtime_twitter_trends_analytics_spark.operators.graph import (
        graph_link_prediction,
    )

    out = tmp_path_factory.mktemp("lp_sf")
    # 20 docs; edge support threshold = 60% of 20 = 12 co-docs, and the
    # stop cap drops tokens in > 90% of docs (> 18). Mix: 8 docs {a,b,c},
    # 4 docs {a,b}, 4 docs {b,c}, 4 filler {d,e} ->
    #   ab co-docs 12 (edge), bc 12 (edge), ac 8 (NO edge),
    #   bbb df 16 <= 18 (survives the stop cap).
    rows = []
    i = 0
    for _ in range(8):
        rows.append((i, "aaa bbb ccc", "en", "s0", 11)); i += 1
    for _ in range(4):
        rows.append((i, "aaa bbb", "en", "s0", 7)); i += 1
    for _ in range(4):
        rows.append((i, "bbb ccc", "en", "s0", 7)); i += 1
    for _ in range(4):
        rows.append((i, "ddd eee", "en", "s0", 7)); i += 1
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = [r.asDict() for r in graph_link_prediction(spark, str(out)).collect()]
    assert got == [
        {
            "tok_a": "aaa",
            "tok_b": "ccc",
            "cn": 1,
            "deg_a": 1,
            "deg_b": 1,
            "jaccard": 1.0,
        }
    ]


# ------------------------------------------------------------ bootstrap
def test_bootstrap_ci_brackets_and_matches_python(spark, sf_dir):
    """The replicate machinery re-done in pure Python (own md5 half-
    sampling, own exact-integer means) must reproduce ci_lo/ci_hi
    exactly; the interval must be ordered and n_events exact."""
    import duckdb as _duck

    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        BOOT_B,
        stats_bootstrap_ci,
    )

    ev = _duck.sql(
        f"SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    reps: dict[str, dict[int, list[int]]] = {}
    for etype, eid, cents in ev:
        h = hashlib.md5(str(eid).encode()).hexdigest()
        for b in range(1, BOOT_B + 1):
            nib = int(h[(b - 1) // 4], 16)
            if (nib >> ((b - 1) % 4)) & 1:
                reps.setdefault(etype, {}).setdefault(b, []).append(cents)

    got = {r["event_type"]: r.asDict() for r in stats_bootstrap_ci(spark, sf_dir).collect()}
    for etype, by_b in reps.items():
        means = sorted(
            (_round_ratio_py(sum(v), len(v)), b) for b, v in by_b.items()
        )
        row = got[etype]
        assert row["ci_lo"] == means[1][0]      # 2nd smallest
        assert row["ci_hi"] == means[-2][0]     # 2nd largest
        assert row["ci_lo"] <= row["ci_hi"]


# ------------------------------------------------------------- seasonal
def test_seasonal_decompose_planted_spike(spark, tmp_path_factory):
    """Three full weeks of 2 events/day with one 9-event spike day: the
    dow baseline for the spike's weekday is (2+2+9)/3, every other dow
    expects 2.0, and the top deviating day must be the spike with
    observed 9."""
    import datetime as dt

    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        events_seasonal_decompose,
    )

    out = tmp_path_factory.mktemp("seas_sf")
    rows = []
    eid = 0
    spike = dt.date(2025, 3, 12)  # a Wednesday inside week 2
    for day in range(3, 24):  # 2025-03-03 (Mon) .. 2025-03-23 (Sun): 3 weeks
        date = dt.date(2025, 3, day)
        n = 9 if date == spike else 2
        for k in range(n):
            rows.append(
                (eid, dt.datetime(2025, 3, day, 10, k), eid % 5, "click", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = [r.asDict() for r in events_seasonal_decompose(spark, str(out)).collect()]
    top = [r for r in got if r["rnk"] == 1][0]
    assert top["day"] == spike and top["observed"] == 9
    # spike dow baseline: (2 + 9 + 2) / 3
    assert top["expected"] == _round_ratio_py(13, 3)


# ------------------------------------------------------------- survival
def test_survival_km_planted_curve(spark, tmp_path_factory):
    """4 users: durations 1 (observed), 1 (observed), 2 (censored),
    3 (observed). KM: S(1) = 1 - 2/4 = 0.5; at t=3 risk set is 1 with 1
    event -> S(3) = 0.0 (the d = n guard). Hazards are exact ratios."""
    import datetime as dt

    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        events_survival_km,
    )

    out = tmp_path_factory.mktemp("km_sf")
    rows = []
    eid = 0

    def ev(uid, etype, day):
        nonlocal eid
        rows.append(
            (eid, dt.datetime(2025, 4, day, 9, 0), uid, etype, 1.0, "{}")
        )
        eid += 1

    # all users first view on day 1; horizon set by user 9's view on day 3
    for uid in (1, 2, 3, 4):
        ev(uid, "view", 1)
    ev(1, "purchase", 2)   # duration 1
    ev(2, "purchase", 2)   # duration 1
    ev(4, "purchase", 4)   # duration 3
    ev(9, "view", 3)       # censored at horizon day 4 - day 3 = duration 1? no:
    # horizon = max event date = day 4; user 3 censored with duration 3,
    # user 9 censored with duration 1.
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {r["duration"]: r.asDict() for r in events_survival_km(spark, str(out)).collect()}
    # t=1: risk 5 (all users), 2 events, 1 censored (user 9)
    assert got[1]["n_risk"] == 5 and got[1]["d_events"] == 2
    assert got[1]["hazard"] == _round_ratio_py(2, 5)
    assert got[1]["survival"] == round(1 - 2 / 5, 4)
    # t=3: risk 2 (users 3 and 4), 1 event -> S *= 1/2
    assert got[3]["n_risk"] == 2 and got[3]["d_events"] == 1
    assert got[3]["survival"] == round((1 - 2 / 5) * (1 - 1 / 2), 4)


# ------------------------------------------------------ audience overlap
def test_audience_overlap_planted_masks(spark, tmp_path_factory):
    """4 users with known type sets: view={1,2,4}, purchase={1,3,4},
    click={4}. The (purchase, view) overlap must read n_both=2,
    jaccard=2/4; (click, view) reads 1/3."""
    import datetime as dt

    from realtime_twitter_trends_analytics_spark.operators.relational_ext import (
        events_audience_overlap,
    )

    out = tmp_path_factory.mktemp("aud_sf")
    rows, eid = [], 0
    plan = {1: ["view", "purchase"], 2: ["view"], 3: ["purchase"],
            4: ["view", "purchase", "click"]}
    for uid, types in plan.items():
        for t in types:
            rows.append((eid, dt.datetime(2025, 5, 1, 8, eid % 60), uid, t, 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {(r["type_a"], r["type_b"]): r.asDict()
           for r in events_audience_overlap(spark, str(out)).collect()}
    pv = got[("purchase", "view")]
    assert (pv["n_a"], pv["n_b"], pv["n_both"]) == (3, 3, 2)
    assert pv["jaccard"] == _round_ratio_py(2, 4)
    cv = got[("click", "view")]
    assert (cv["n_a"], cv["n_b"], cv["n_both"]) == (1, 3, 1)
    assert cv["jaccard"] == _round_ratio_py(1, 3)


# -------------------------------------------------------- trigram paths
def test_trigram_paths_planted_sequences(spark, tmp_path_factory):
    """u1 emits view,click,purchase,view (paths v>c>p and c>p>v); u2
    emits view,click,purchase (path v>c>p). Counts: v>c>p = 2,
    c>p>v = 1; shares 2/3 and 1/3."""
    import datetime as dt

    from realtime_twitter_trends_analytics_spark.operators.relational_ext import (
        events_trigram_paths,
    )

    out = tmp_path_factory.mktemp("tri_sf")
    rows, eid = [], 0
    for uid, seq in ((1, ["view", "click", "purchase", "view"]),
                     (2, ["view", "click", "purchase"])):
        for k, t in enumerate(seq):
            rows.append((eid, dt.datetime(2025, 5, 2, 9, k), uid, t, 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {r["path"]: r.asDict() for r in events_trigram_paths(spark, str(out)).collect()}
    assert got["view>click>purchase"]["n"] == 2
    assert got["view>click>purchase"]["share"] == _round_ratio_py(2, 3)
    assert got["click>purchase>view"]["n"] == 1
    assert got["click>purchase>view"]["share"] == _round_ratio_py(1, 3)


# ------------------------------------------------------------- logreg
def test_logreg_irls_matches_unquantized_python(spark, sf_dir):
    """Pure-Python UNQUANTIZED Newton/IRLS with the same Cramer solve must
    land within 1e-5 of the engine's fixed-point betas (per-row floor
    quantization at 1e-9 bounds the gradient/Hessian error by n/1e9, so
    the solves stay this close) — pinning that the quantization buys
    determinism without distorting the model. Plus the semantic floor:
    the fit must beat chance (mean log-loss < ln 2) and the minority-
    class intercept must be negative."""
    import duckdb as _duck

    from realtime_twitter_trends_analytics_spark.operators.ml import (
        LOGREG_ITERS,
        ml_logreg_irls,
    )

    rows = _duck.sql(
        f"SELECT CAST(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS DOUBLE), "
        f"CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) / 10000.0, "
        f"CAST(hour(ts) AS DOUBLE) / 24.0 "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    b = [0.0, 0.0, 0.0]
    for _ in range(LOGREG_ITERS):
        g = [0.0] * 3
        h = {}
        for y, x1, x2 in rows:
            xs = (1.0, x1, x2)
            p = 1.0 / (1.0 + math.exp(-(b[0] + b[1] * x1 + b[2] * x2)))
            w = p * (1.0 - p)
            for j in range(3):
                g[j] += (y - p) * xs[j]
                for k in range(j, 3):
                    h[(j, k)] = h.get((j, k), 0.0) + w * xs[j] * xs[k]
        h00, h01, h02 = h[(0, 0)], h[(0, 1)], h[(0, 2)]
        h11, h12, h22 = h[(1, 1)], h[(1, 2)], h[(2, 2)]
        det = (
            h00 * (h11 * h22 - h12 * h12)
            - h01 * (h01 * h22 - h12 * h02)
            + h02 * (h01 * h12 - h11 * h02)
        )
        b = [
            b[0]
            + (g[0] * (h11 * h22 - h12 * h12) - h01 * (g[1] * h22 - h12 * g[2])
               + h02 * (g[1] * h12 - h11 * g[2])) / det,
            b[1]
            + (h00 * (g[1] * h22 - h12 * g[2]) - g[0] * (h01 * h22 - h12 * h02)
               + h02 * (h01 * g[2] - g[1] * h02)) / det,
            b[2]
            + (h00 * (h11 * g[2] - g[1] * h12) - h01 * (h01 * g[2] - g[1] * h02)
               + g[0] * (h01 * h12 - h11 * h02)) / det,
        ]

    got = ml_logreg_irls(spark, sf_dir).collect()[0].asDict()
    assert got["n_rows"] == len(rows)
    assert abs(got["b_intercept"] - b[0]) < 1e-5
    assert abs(got["b_value"] - b[1]) < 1e-5
    assert abs(got["b_hour"] - b[2]) < 1e-5
    assert got["mean_log_loss"] < math.log(2.0)   # beats chance
    assert got["b_intercept"] < 0                 # purchase is the minority
