"""Round-8 third-session operators: independent numpy/pandas references
for one-way ANOVA, Spearman rho, the Benford digit audit, and the
trimmed/winsorized means. Each gated query also has a DuckDB oracle (the
cross-engine equality gate); these tests check the MATH means what the
docstring claims, which value-equality alone cannot.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
    TRIM_PCT,
    events_benford_digits,
    stats_anova_oneway,
    stats_spearman_rho,
    stats_trimmed_means,
)

SF = "/root/testdata/sf0.001"


def _events_pdf() -> pd.DataFrame:
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    ts = pdf["ts"]
    if ts.dtype.kind in "iu":  # int64 nanos
        secs = ts // 1_000_000_000
    else:
        secs = ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000
    pdf = pdf.assign(
        cents=np.round(pdf["value"] * 100).astype("int64"),
        dow=((secs // 86400) + 4) % 7,
        hod=(secs // 3600) % 24,
    )
    return pdf


def test_anova_matches_textbook_decomposition(spark):
    """F and eta^2 from the raw per-row cents match the classic
    SSB/SSW decomposition computed directly in numpy (the quantized
    s1^2/n rounding is <=0.5 cents^2 per group, invisible at 4dp)."""
    pdf = _events_pdf()
    got = {r["event_type"]: r for r in stats_anova_oneway(spark, SF).collect()}
    for etype, sub in pdf.groupby("event_type"):
        x = sub["cents"].to_numpy(dtype=np.float64)
        groups = [g["cents"].to_numpy(dtype=np.float64) for _, g in sub.groupby("dow")]
        grand = x.mean()
        ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
        k, n = len(groups), len(x)
        f_ref = (ssb / (k - 1)) / (ssw / (n - k))
        eta_ref = ssb / (ssb + ssw)
        row = got[etype]
        assert row["k_groups"] == k and row["n"] == n
        assert abs(row["f_stat"] - f_ref) < 5e-4, (etype, row["f_stat"], f_ref)
        assert abs(row["eta_sq"] - eta_ref) < 5e-4


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    """Tie-averaged ranks (1-based), the scipy.stats.rankdata('average')
    semantics, written directly so the test has no scipy dependency."""
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=np.float64)
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def test_spearman_matches_rank_pearson(spark):
    """rho equals Pearson correlation of tie-averaged ranks computed
    independently in numpy."""
    pdf = _events_pdf()
    got = {r["event_type"]: r for r in stats_spearman_rho(spark, SF).collect()}
    for etype, sub in pdf.groupby("event_type"):
        rx = _avg_ranks(sub["cents"].to_numpy())
        ry = _avg_ranks(sub["hod"].to_numpy())
        ref = np.corrcoef(rx, ry)[0, 1]
        row = got[etype]
        assert row["n"] == len(sub)
        assert abs(row["rho"] - ref) < 5e-4, (etype, row["rho"], ref)


def test_benford_expected_and_contrib(spark):
    """Per-digit expectations are n*log10(1+1/d); contributions are the
    chi-square terms; observed counts match a direct string-digit count;
    expectations sum to ~n per type."""
    pdf = _events_pdf()
    pdf = pdf[pdf["cents"] > 0].assign(
        digit=lambda d: d["cents"].astype(str).str[0].astype(int)
    )
    rows = events_benford_digits(spark, SF).collect()
    bytype: dict[str, float] = {}
    for r in rows:
        n_type = (pdf["event_type"] == r["event_type"]).sum()
        obs_ref = (
            (pdf["event_type"] == r["event_type"]) & (pdf["digit"] == r["digit"])
        ).sum()
        exp_ref = n_type * math.log10(1 + 1 / r["digit"])
        assert r["observed"] == obs_ref
        assert abs(r["expected"] - exp_ref) < 5e-4
        assert abs(r["chi2_contrib"] - (obs_ref - exp_ref) ** 2 / exp_ref) < 5e-3
        bytype[r["event_type"]] = bytype.get(r["event_type"], 0.0) + r["expected"]
    for etype, tot in bytype.items():
        n_type = (pdf["event_type"] == etype).sum()
        assert abs(tot - n_type) < 0.01 * n_type + 1


def test_trimmed_and_winsorized_match_numpy(spark):
    """Trimmed mean = mean of the sorted middle n-2k; winsorized mean =
    mean after clamping the k outermost values to the boundary order
    statistics — both computed independently on the sorted cents."""
    pdf = _events_pdf()
    got = {r["event_type"]: r for r in stats_trimmed_means(spark, SF).collect()}
    for etype, sub in pdf.groupby("event_type"):
        v = np.sort(sub["cents"].to_numpy(dtype=np.int64))
        n = len(v)
        k = n // (100 // TRIM_PCT)
        trimmed = v[k : n - k].mean() / 100
        w = v.copy()
        w[:k] = v[k]
        w[n - k :] = v[n - k - 1]
        winsor = w.mean() / 100
        row = got[etype]
        assert row["n"] == n and row["trimmed_each_side"] == k
        assert abs(row["raw_mean"] - v.mean() / 100) < 1e-4
        assert abs(row["trimmed_mean"] - trimmed) < 1e-4, (etype, row, trimmed)
        assert abs(row["winsor_mean"] - winsor) < 1e-4, (etype, row, winsor)


def test_pmi_matches_direct_computation(spark):
    """PMI rows equal ln(N*c_xy/(c_x*c_y)) computed directly from pandas
    token/bigram counts, and every returned pair meets the count floor."""
    from collections import Counter

    from realtime_twitter_trends_analytics_spark.operators.textstats import (
        COLL_MIN,
        COLL_Q,
        textstats_collocation_pmi,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in docs["text"]:
        toks = t.split(" ")
        uni.update(toks)
        bi.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    n = sum(uni.values())
    rows = textstats_collocation_pmi(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["c_xy"] >= COLL_MIN
        w1, w2 = r["bigram"].split(" ")
        assert r["c_xy"] == bi[r["bigram"]]
        assert r["c_x"] == uni[w1] and r["c_y"] == uni[w2]
        lift_q = (n * r["c_xy"] * COLL_Q) // (r["c_x"] * r["c_y"])
        assert abs(r["pmi"] - math.log(lift_q / COLL_Q)) < 5e-4


def test_jsd_matches_full_grid_reference(spark):
    """jsd_bits equals the textbook JSD (computed over the FULL
    vocabulary grid, zeros included) between each source's unigram
    distribution and the complement corpus — proving the observed-cells
    closure term is exact. JSD is bounded by 1 bit."""
    from collections import Counter

    from realtime_twitter_trends_analytics_spark.operators.textstats import (
        docs_jsd_drift,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per_source: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for src, t in zip(docs["source"], docs["text"]):
        c = per_source.setdefault(src, Counter())
        toks = t.split(" ")
        c.update(toks)
        corpus.update(toks)
    total = sum(corpus.values())
    got = {r["source"]: r for r in docs_jsd_drift(spark, SF).collect()}
    assert set(got) == set(per_source)
    for src, cs in per_source.items():
        ts = sum(cs.values())
        ref = 0.0
        for w, cw in corpus.items():
            p = cs.get(w, 0) / ts
            q = (cw - cs.get(w, 0)) / (total - ts)
            m = (p + q) / 2
            if p > 0:
                ref += 0.5 * p * math.log(p / m)
            if q > 0:
                ref += 0.5 * q * math.log(q / m)
        ref_bits = ref / math.log(2)
        row = got[src]
        assert row["n_tokens"] == ts and row["vocab"] == len(cs)
        assert 0.0 <= row["jsd_bits"] <= 1.0
        assert abs(row["jsd_bits"] - ref_bits) < 5e-4, (src, row["jsd_bits"], ref_bits)


def test_compaction_plan_invariants(spark):
    """The plan is a partition of each day's files into consecutive-hour
    groups; group ids are dense from 0; every group but the last of a
    day holds >= 1 file and group bytes reconstruct the day's total; the
    greedy rule is honored (a file starts a new group iff the bytes
    before it cross the target boundary)."""
    from realtime_twitter_trends_analytics_spark.operators.layout import (
        COMPACT_TARGET,
        layout_compaction_plan,
    )

    rows = layout_compaction_plan(spark, SF).collect()
    assert rows
    bydays: dict[int, list] = {}
    for r in rows:
        bydays.setdefault(r["day"], []).append(r)
    for day, fs in bydays.items():
        fs.sort(key=lambda r: r["hour"])
        cum = 0
        for r in fs:
            assert r["compact_group"] == cum // COMPACT_TARGET, (day, r)
            cum += r["file_bytes"]
        # group totals reconstruct and are internally consistent
        bygrp: dict[int, list] = {}
        for r in fs:
            bygrp.setdefault(r["compact_group"], []).append(r)
        for g, members in bygrp.items():
            tot = sum(m["file_bytes"] for m in members)
            assert all(m["group_bytes"] == tot for m in members)
            assert all(m["group_files"] == len(members) for m in members)
        assert sum(m["file_bytes"] for m in fs) == sum(
            sum(m["file_bytes"] for m in ms) for ms in bygrp.values()
        )


def test_mutual_information_matches_direct(spark):
    """mi/h/nmi for the etype x dow pair equal the textbook formulas
    computed directly from pandas contingency counts."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        stats_mutual_information,
    )

    pdf = _events_pdf()
    rows = {
        (r["var_a"], r["var_b"]): r
        for r in stats_mutual_information(spark, SF).collect()
    }
    assert set(rows) == {("etype", "dow"), ("etype", "vbin"), ("dow", "vbin")}
    n = len(pdf)
    joint = pdf.groupby(["event_type", "dow"]).size()
    pa = pdf.groupby("event_type").size()
    pb = pdf.groupby("dow").size()
    mi = sum(
        (o / n) * math.log(o * n / (pa[a] * pb[b]))
        for (a, b), o in joint.items()
    )
    ha = sum(-(c / n) * math.log(c / n) for c in pa)
    hb = sum(-(c / n) * math.log(c / n) for c in pb)
    r = rows[("etype", "dow")]
    ln2 = math.log(2)
    assert r["n"] == n
    assert abs(r["mi_bits"] - mi / ln2) < 5e-4
    assert abs(r["h_a_bits"] - ha / ln2) < 5e-4
    assert abs(r["h_b_bits"] - hb / ln2) < 5e-4
    assert abs(r["nmi"] - mi / math.sqrt(ha * hb)) < 5e-4
    for rr in rows.values():  # information inequalities
        assert rr["mi_bits"] <= min(rr["h_a_bits"], rr["h_b_bits"]) + 1e-6
        assert -1e-6 <= rr["nmi"] <= 1.0


def test_hill_matches_sorted_order_statistics(spark):
    """alpha equals k / sum ln(x_i/x_(k+1)) over the top-k values taken
    from an independent full sort; ties never change the answer because
    the estimator reads the value multiset."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        HILL_KMAX,
        events_hill_tail_index,
    )

    pdf = _events_pdf()
    got = {r["event_type"]: r for r in events_hill_tail_index(spark, SF).collect()}
    for etype, sub in pdf.groupby("event_type"):
        v = np.sort(sub.loc[sub["cents"] > 0, "cents"].to_numpy())[::-1]
        n = len(v)
        k = min(HILL_KMAX, n // 10)
        xk1 = v[k]  # position k+1, 1-based
        ref = k / np.log(v[:k] / xk1).sum()
        row = got[etype]
        assert row["n"] == n and row["k"] == k
        assert abs(row["tail_threshold"] - xk1 / 100) < 1e-4
        assert abs(row["hill_alpha"] - ref) < 5e-3, (etype, row["hill_alpha"], ref)


def test_class_balance_exact_equalization(spark):
    """Every class keeps exactly min-class-size docs; the checksums match
    an independent pandas hash ranking; membership is stable when other
    classes grow (determinism contract)."""
    import hashlib

    from realtime_twitter_trends_analytics_spark.operators.sampling import (
        sample_class_balance,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def h60(did: int) -> int:
        return int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16)

    docs = docs.assign(h=docs["doc_id"].map(h60))
    m = docs.groupby("lang").size().min()
    rows = sample_class_balance(spark, SF).collect()
    assert {r["lang"] for r in rows} == set(docs["lang"].unique())
    for r in rows:
        sub = docs[docs["lang"] == r["lang"]].sort_values(["h", "doc_id"]).head(m)
        assert r["n_kept"] == m
        assert r["n_class"] == (docs["lang"] == r["lang"]).sum()
        assert r["kept_docid_sum"] == sub["doc_id"].sum()
        assert r["kept_docid_min"] == sub["doc_id"].min()
        assert r["kept_docid_max"] == sub["doc_id"].max()


def test_bfs_frontiers_match_networkx_style_reference(spark):
    """Frontier sizes and membership equal a plain python BFS over the
    same thresholded co-occurrence edges."""
    from collections import deque

    from realtime_twitter_trends_analytics_spark.operators.graph import (
        BFS_ROUNDS,
        _cooc_edges,
        graph_bfs_frontiers,
    )

    edges = [(r["tok_a"], r["tok_b"]) for r in _cooc_edges(spark, SF).collect()]
    adj: dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seed = min(adj, key=lambda n: (len(adj[n]), n))
    dist = {seed: 0}
    dq = deque([seed])
    while dq:
        u = dq.popleft()
        if dist[u] >= BFS_ROUNDS:
            continue
        for v in sorted(adj[u]):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    rows = {r["dist"]: r for r in graph_bfs_frontiers(spark, SF).collect()}
    for d in range(BFS_ROUNDS + 1):
        members = sorted(n for n, dd in dist.items() if dd == d)
        if not members:
            assert d not in rows
            continue
        assert rows[d]["n_nodes"] == len(members)
        assert rows[d]["min_token"] == members[0]
        assert rows[d]["max_token"] == members[-1]
    unreached = sorted(n for n in adj if n not in dist)
    if unreached:
        assert rows[-1]["n_nodes"] == len(unreached)
    else:
        assert -1 not in rows


def test_knn_calibration_consistency(spark):
    """Calibration buckets partition the eval set; aggregate accuracy
    reconciles with sim_knn_label_probe's per-label readout; vote shares
    are valid (majority needs > K/#labels... at least ceil(K/#cands)),
    and accuracy/confidence are exact ratios of the integer columns."""
    from realtime_twitter_trends_analytics_spark.operators.similarity import (
        KNN_EVAL_N,
        KNN_K,
        ml_knn_calibration,
        sim_knn_label_probe,
    )

    rows = ml_knn_calibration(spark, SF).collect()
    assert sum(r["n_queries"] for r in rows) == KNN_EVAL_N
    probe = sim_knn_label_probe(spark, SF).collect()
    assert sum(r["n_correct"] for r in rows) == sum(p["n_correct"] for p in probe)
    for r in rows:
        assert 1 <= r["votes_top"] <= KNN_K
        assert 0 <= r["n_correct"] <= r["n_queries"]
        assert abs(r["confidence"] - r["votes_top"] / KNN_K) < 1e-9
        assert abs(r["accuracy"] - round(r["n_correct"] / r["n_queries"], 4)) < 2e-4
        assert abs(r["calib_gap"] - round(r["accuracy"] - r["confidence"], 4)) < 2e-4


def test_levene_bf_matches_direct(spark):
    """bf_stat equals a direct Brown-Forsythe computation (ANOVA F over
    |x - group median| deviations) from the raw rows; medians use the
    lower+upper order-statistic convention (2x-scaled integer med2)."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        stats_levene_bf,
    )

    pdf = _events_pdf()
    got = {r["event_type"]: r for r in stats_levene_bf(spark, SF).collect()}
    for etype, sub in pdf.groupby("event_type"):
        devs = []
        for _, g in sub.groupby("dow"):
            v = np.sort(g["cents"].to_numpy(dtype=np.int64))
            n = len(v)
            med2 = v[(n + 1) // 2 - 1] + v[(n + 2) // 2 - 1]
            devs.append(np.abs(2 * v - med2).astype(np.float64))
        grand = np.concatenate(devs).mean()
        ssb = sum(len(d_) * (d_.mean() - grand) ** 2 for d_ in devs)
        ssw = sum(((d_ - d_.mean()) ** 2).sum() for d_ in devs)
        k = len(devs)
        n = sum(len(d_) for d_ in devs)
        ref = (ssb / (k - 1)) / (ssw / (n - k))
        row = got[etype]
        assert row["k_groups"] == k and row["n"] == n
        assert abs(row["bf_stat"] - ref) < 5e-4, (etype, row["bf_stat"], ref)


def test_wow_revenue_matches_pandas(spark):
    """Weekly sums, WoW%, and the trailing MA4 match a direct pandas
    resample over the same epoch-week buckets."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        orders_wow_revenue,
    )

    o = pd.read_parquet(f"{SF}/orders.parquet")
    secs = o["o_orderdate"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
    o = o.assign(wk=secs // 604800, cents=np.round(o["o_totalprice"] * 100).astype("int64"))
    byw = o.groupby("wk").agg(n=("wk", "size"), rev=("cents", "sum")).sort_index()
    rows = orders_wow_revenue(spark, SF).collect()
    assert len(rows) == len(byw)
    prev = None
    ma: list[int] = []
    for r, (wk, ref) in zip(rows, byw.iterrows()):
        assert r["wk"] == wk and r["n_orders"] == ref["n"]
        assert abs(r["revenue"] - ref["rev"] / 100) < 1e-4
        if prev is None:
            assert r["wow_pct"] is None
        else:
            assert abs(r["wow_pct"] - (ref["rev"] - prev) / prev * 100) < 5e-4
        ma = (ma + [ref["rev"]])[-4:]
        assert abs(r["ma4_revenue"] - sum(ma) / len(ma) / 100) < 1e-4
        prev = ref["rev"]


def test_ttr_hapax_matches_counters(spark):
    """Vocab / hapax / dis counts match direct Counters per source."""
    from collections import Counter

    from realtime_twitter_trends_analytics_spark.operators.textstats import (
        docs_ttr_hapax,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    got = {r["source"]: r for r in docs_ttr_hapax(spark, SF).collect()}
    for src, sub in docs.groupby("source"):
        c: Counter = Counter()
        for t in sub["text"]:
            c.update(t.split(" "))
        row = got[src]
        n_tok = sum(c.values())
        hapax = sum(1 for v in c.values() if v == 1)
        assert row["n_tokens"] == n_tok
        assert row["vocab"] == len(c)
        assert row["hapax"] == hapax
        assert row["dis"] == sum(1 for v in c.values() if v == 2)
        assert abs(row["ttr"] - len(c) / n_tok) < 1e-4
        assert abs(row["hapax_share"] - hapax / len(c)) < 1e-4


def test_leadtime_percentiles_match_numpy_order_stats(spark):
    """Each pXX equals the value at position ceil(q*n/100) of the
    independently sorted lead-day array per flag."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        LEAD_PCTS,
        lineitem_leadtime_percentiles,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")

    def days(col):
        return col.astype("datetime64[ns]").astype("int64") // (
            1_000_000_000 * 86400
        )

    j = j.assign(ld=days(j["l_shipdate"]) - days(j["o_orderdate"]))
    got = {
        r["l_returnflag"]: r
        for r in lineitem_leadtime_percentiles(spark, SF).collect()
    }
    for flag, sub in j.groupby("l_returnflag"):
        v = np.sort(sub["ld"].to_numpy())
        n = len(v)
        row = got[flag]
        assert row["n"] == n and row["max_days"] == v[-1]
        for q in LEAD_PCTS:
            pos = -(-q * n // 100)  # ceil
            assert row[f"p{q}_days"] == v[pos - 1], (flag, q)


def test_slo_burn_matches_direct(spark):
    """Burn rates and the multi-window page flag match a direct pandas
    recomputation under the documented thresholds."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        BURN_FAST_X10,
        BURN_SLOW_X10,
        events_slo_burn,
    )

    pdf = _events_pdf()
    ts = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
    pdf = pdf.assign(day=ts // 86400, hour=(ts // 3600) % 24,
                     is_err=(pdf["event_type"] == "error").astype(int))
    got = {r["day"]: r for r in events_slo_burn(spark, SF).collect()}
    for day, sub in pdf.groupby("day"):
        n, err = len(sub), sub["is_err"].sum()
        hourly = sub.groupby("hour").agg(nh=("is_err", "size"), eh=("is_err", "sum"))
        fast = int((1000 * hourly["eh"] >= BURN_FAST_X10 * hourly["nh"]).sum())
        slow = int(1000 * err >= BURN_SLOW_X10 * n)
        row = got[day]
        assert row["n_events"] == n and row["n_errors"] == err
        assert abs(row["burn_24h"] - round(100 * err / n, 4)) < 2e-4
        assert row["fast_hours"] == fast
        assert row["slow_alert"] == slow
        assert row["page"] == int(slow and fast > 0)


def test_two_proportion_ztest_matches_direct(spark):
    """Counts and z match a direct pandas recomputation under the same
    md5-nibble variant assignment and $100 success threshold."""
    import hashlib

    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        PROP_SUCCESS_CENTS,
        stats_two_proportion_ztest,
    )

    pdf = _events_pdf()
    pdf = pdf.assign(
        variant=pdf["user_id"].map(
            lambda u: "A"
            if int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) < 8
            else "B"
        ),
        s=(pdf["cents"] >= PROP_SUCCESS_CENTS).astype(int),
    )
    got = {r["event_type"]: r for r in stats_two_proportion_ztest(spark, SF).collect()}
    for etype, sub in pdf.groupby("event_type"):
        a, b = sub[sub["variant"] == "A"], sub[sub["variant"] == "B"]
        na, xa, nb, xb = len(a), a["s"].sum(), len(b), b["s"].sum()
        row = got[etype]
        assert (row["na"], row["xa"], row["nb"], row["xb"]) == (na, xa, nb, xb)
        pp = (xa + xb) / (na + nb)
        ref = (xa / na - xb / nb) / math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
        assert abs(row["z_stat"] - ref) < 5e-4, (etype, row["z_stat"], ref)


def test_growth_accounting_partitions_actives(spark):
    """new + returning + resurrected == active per day; statuses match a
    direct per-user day-sequence walk; summed new users == total users."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        RESURRECT_GAP_DAYS,
        events_growth_accounting,
    )

    pdf = _events_pdf()
    ts = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
    pdf = pdf.assign(day=ts // 86400)
    ref: dict[int, dict[str, int]] = {}
    for _, sub in pdf.groupby("user_id"):
        days = sorted(sub["day"].unique())
        prev = None
        for i, dday in enumerate(days):
            st = (
                "new"
                if i == 0
                else ("resurrected" if dday - prev > RESURRECT_GAP_DAYS else "returning")
            )
            ref.setdefault(dday, {"new": 0, "returning": 0, "resurrected": 0})[st] += 1
            prev = dday
    rows = events_growth_accounting(spark, SF).collect()
    assert {r["day"] for r in rows} == set(ref)
    for r in rows:
        e = ref[r["day"]]
        assert r["n_new"] == e["new"]
        assert r["n_returning"] == e["returning"]
        assert r["n_resurrected"] == e["resurrected"]
        assert r["n_active"] == sum(e.values())
    assert sum(r["n_new"] for r in rows) == pdf["user_id"].nunique()


def test_cuped_matches_direct_theta(spark):
    """Adjusted means equal the textbook y_adj decomposition computed in
    pandas under the same split day and covariate; pooled rho2 equals
    the squared pooled correlation."""
    import hashlib

    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        events_cuped_adjustment,
    )

    pdf = _events_pdf()
    ts = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
    pdf = pdf.assign(day=ts // 86400)
    mid = (pdf["day"].min() + pdf["day"].max() + 1) // 2
    u = pdf.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "x": g.loc[g["day"] < mid, "cents"].sum(),
                "y": g.loc[g["day"] >= mid, "cents"].sum(),
            }
        ),
        include_groups=False,
    )
    u = u.assign(
        variant=[
            "A" if int(hashlib.md5(str(i).encode()).hexdigest()[0], 16) < 8 else "B"
            for i in u.index
        ]
    )
    x, y = u["x"].to_numpy(np.float64), u["y"].to_numpy(np.float64)
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    got = {r["variant"]: r for r in events_cuped_adjustment(spark, SF).collect()}
    for v in ("A", "B"):
        sub = u[u["variant"] == v]
        raw = sub["y"].mean() / 100
        adj = (sub["y"].mean() - theta * (sub["x"].mean() - x.mean())) / 100
        row = got[v]
        assert row["n"] == len(sub)
        assert abs(row["mean_spend"] - raw) < 1e-3
        assert abs(row["mean_spend_cuped"] - adj) < 1e-3, (v, row, adj)
        assert abs(row["pooled_rho2"] - rho2) < 1e-3
    # CUPED moves both variants by a common-theta shift; the adjusted
    # estimator must preserve the pooled mean up to weighting error
    na, nb = got["A"]["n"], got["B"]["n"]
    pooled_raw = (got["A"]["mean_spend"] * na + got["B"]["mean_spend"] * nb) / (na + nb)
    pooled_adj = (
        got["A"]["mean_spend_cuped"] * na + got["B"]["mean_spend_cuped"] * nb
    ) / (na + nb)
    assert abs(pooled_raw - pooled_adj) < 1e-3


def test_auc_matches_sklearn_style_reference(spark):
    """AUC equals the probability a random positive outranks a random
    negative (ties = 1/2), computed directly per dow."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        AUC_POS_TYPE,
        ml_auc_roc,
    )

    pdf = _events_pdf()
    got = {r["dow"]: r for r in ml_auc_roc(spark, SF).collect()}
    for dow, sub in pdf.groupby("dow"):
        pos = np.sort(sub.loc[sub["event_type"] == AUC_POS_TYPE, "cents"].to_numpy())
        neg = np.sort(sub.loc[sub["event_type"] != AUC_POS_TYPE, "cents"].to_numpy())
        if len(pos) == 0 or len(neg) == 0:
            assert dow not in got
            continue
        # P(pos > neg) + 0.5 P(pos == neg) via searchsorted
        wins = np.searchsorted(neg, pos, side="left").sum()
        ties = (
            np.searchsorted(neg, pos, side="right")
            - np.searchsorted(neg, pos, side="left")
        ).sum()
        ref = (wins + 0.5 * ties) / (len(pos) * len(neg))
        row = got[dow]
        assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
        assert abs(row["auc"] - ref) < 2e-4, (dow, row["auc"], ref)
        assert abs(row["gini"] - (2 * row["auc"] - 1)) < 1e-9


def test_power_mde_matches_direct(spark):
    """MDE equals (z_a+z_b)*sqrt(va/na + vb/nb) with sample variances
    computed independently per variant."""
    import hashlib

    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        stats_power_mde,
    )

    pdf = _events_pdf()
    pdf = pdf.assign(
        variant=pdf["user_id"].map(
            lambda u: "A"
            if int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) < 8
            else "B"
        )
    )
    got = {r["event_type"]: r for r in stats_power_mde(spark, SF).collect()}
    for etype, sub in pdf.groupby("event_type"):
        a = sub.loc[sub["variant"] == "A", "cents"].to_numpy(np.float64)
        b = sub.loc[sub["variant"] == "B", "cents"].to_numpy(np.float64)
        if len(a) < 2 or len(b) < 2:
            assert etype not in got
            continue
        mde = (1.959964 + 0.841621) * math.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        row = got[etype]
        assert row["na"] == len(a) and row["nb"] == len(b)
        assert abs(row["mean_a"] - a.mean() / 100) < 1e-3
        assert abs(row["mde_dollars"] - mde / 100) < 1e-3
        assert abs(row["mde_pct"] - mde / a.mean() * 100) < 1e-2


def test_reorder_intervals_match_pandas(spark):
    """Band counts equal a direct per-customer consecutive-gap walk and
    shares sum to ~1."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        REORDER_BUCKET_DAYS,
        orders_reorder_intervals,
    )

    o = pd.read_parquet(f"{SF}/orders.parquet")
    days = o["o_orderdate"].astype("datetime64[ns]").astype("int64") // (
        1_000_000_000 * 86400
    )
    o = o.assign(day=days)
    bands: dict[int, int] = {}
    for _, sub in o.groupby("o_custkey"):
        d_ = np.sort(sub["day"].to_numpy())
        for gap in np.diff(d_):
            bands[gap // REORDER_BUCKET_DAYS] = (
                bands.get(gap // REORDER_BUCKET_DAYS, 0) + 1
            )
    rows = orders_reorder_intervals(spark, SF).collect()
    assert {r["band"]: r["n_gaps"] for r in rows} == bands
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-2
    for r in rows:
        assert r["band_min_days"] == r["band"] * REORDER_BUCKET_DAYS
