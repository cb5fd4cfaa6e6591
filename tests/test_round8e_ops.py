"""Round-8 fourth-session operators: independent pandas/numpy references
for the DAU/MAU stickiness interval-merge rewrite and Kendall tau-b.
Each gated query also has a DuckDB oracle (the cross-engine equality
gate); these tests check the MATH means what the docstring claims,
which value-equality alone cannot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
    MAU_WINDOW_DAYS,
    events_stickiness_dau_mau,
    stats_kendall_tau,
)

SF = "/root/testdata/sf0.001"


def _day_index(ts: pd.Series) -> pd.Series:
    if ts.dtype.kind in "iu":  # int64 nanos
        secs = ts // 1_000_000_000
    else:
        secs = ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000
    return secs // 86400


def test_stickiness_matches_bruteforce_trailing_window(spark):
    """The interval-merge MAU equals the definitional brute force: for
    each day with activity, |{users active in [d-27, d]}| — proving the
    gaps-and-islands coverage rewrite loses and invents nobody."""
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf.assign(di=_day_index(pdf["ts"]))
    ud = pdf[["user_id", "di"]].drop_duplicates()
    got = {r["di"]: r for r in events_stickiness_dau_mau(spark, SF).collect()}
    days = sorted(ud["di"].unique())
    assert set(got) == set(days)
    for d in days:
        dau_ref = ud.loc[ud["di"] == d, "user_id"].nunique()
        in_win = ud[(ud["di"] <= d) & (ud["di"] >= d - (MAU_WINDOW_DAYS - 1))]
        mau_ref = in_win["user_id"].nunique()
        row = got[d]
        assert row["dau"] == dau_ref, (d, row["dau"], dau_ref)
        assert row["mau_28d"] == mau_ref, (d, row["mau_28d"], mau_ref)
        assert abs(row["stickiness"] - round(dau_ref / mau_ref, 4)) <= 1e-9


def test_stickiness_interval_merge_covers_gap_edge():
    """Pure-python check of the merge rule at the boundary: two active
    days exactly W apart must merge (coverage windows touch); W+1 apart
    must not — the `di - lag > W` break condition, exercised directly."""
    W = MAU_WINDOW_DAYS
    # coverage of day d = [d, d+W-1]; days d and d+W give [d, d+2W-1]
    # contiguous; days d and d+W+1 leave day d+W covered by NEITHER? No:
    # d covers through d+W-1, d+W+1 covers from d+W+1 -> day d+W is bare.
    def covered(days: list[int]) -> set[int]:
        out: set[int] = set()
        for d in days:
            out.update(range(d, d + W))
        return out

    merged = covered([100, 100 + W])
    assert merged == set(range(100, 100 + 2 * W))
    split = covered([100, 100 + W + 1])
    assert 100 + W not in split


def test_kendall_tau_matches_pairwise_definition(spark):
    """tau-b and the C/D/tie counts equal the O(n^2) definitional
    computation in numpy over the same day-grain (count, cents) series."""
    pdf = pd.read_parquet(f"{SF}/orders.parquet")
    pdf = pdf.assign(
        di=_day_index(pdf["o_orderdate"]),
        cents=np.round(pdf["o_totalprice"] * 100).astype("int64"),
    )
    day = pdf.groupby("di").agg(x=("o_orderkey", "count"), y=("cents", "sum"))
    x = day["x"].to_numpy(dtype=np.int64)
    y = day["y"].to_numpy(dtype=np.int64)
    n = len(x)
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(n, k=1)
    prod = dx[iu] * dy[iu]
    nc = int((prod > 0).sum())
    nd = int((prod < 0).sum())
    tx = int((dx[iu] == 0).sum())
    ty = int((dy[iu] == 0).sum())
    n0 = n * (n - 1) // 2
    tau_ref = (nc - nd) / np.sqrt((n0 - tx) * (n0 - ty))
    row = stats_kendall_tau(spark, SF).collect()[0]
    assert row["n_days"] == n and row["nc"] == nc and row["nd"] == nd
    assert row["tx"] == tx and row["ty"] == ty
    assert abs(row["tau_b"] - round(tau_ref, 4)) <= 1e-9
    z_ref = 3.0 * (nc - nd) / np.sqrt(n * (n - 1) * (2 * n + 5) / 2.0)
    assert abs(row["z_stat"] - round(z_ref, 4)) <= 1e-9


def test_feature_hashing_matches_python_hash(spark):
    """Bucket ids, signs, and counts match a direct python md5
    reimplementation of the hashing trick over the same whitespace
    tokenization."""
    import hashlib
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        FH_DIM,
        FH_TOP,
        ml_feature_hashing,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    buckets: dict[int, list] = {}
    for text in docs["text"]:
        for w in text.split():
            hx = hashlib.md5(w.encode()).hexdigest()
            feat = int(hx[:8], 16) % FH_DIM
            sgn = 1 if int(hx[8], 16) < 8 else -1
            b = buckets.setdefault(feat, [0, 0, set()])
            b[0] += 1
            b[1] += sgn
            b[2].add(w)
    top = sorted(buckets.items(), key=lambda kv: (-kv[1][0], kv[0]))[:FH_TOP]
    got = ml_feature_hashing(spark, SF).collect()
    assert len(got) == FH_TOP
    for row, (feat, (n, ssum, toks)) in zip(got, top):
        assert row["feat"] == feat and row["n_instances"] == n
        assert row["signed_sum"] == ssum
        assert row["n_distinct_tokens"] == len(toks)


def test_neyman_allocation_matches_formula(spark):
    """Shares equal N_h*s_h / sum over strata computed independently in
    numpy (ddof=1 std), and the shares sum to ~1."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        NEYMAN_BUDGET,
        sample_neyman_allocation,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf.assign(cents=np.round(pdf["value"] * 100).astype("int64"))
    g = pdf.groupby("event_type")["cents"]
    n = g.count()
    s = g.std(ddof=1)
    wt = n * s
    shares = wt / wt.sum()
    got = {r["event_type"]: r for r in sample_neyman_allocation(spark, SF).collect()}
    assert set(got) == set(shares.index)
    assert abs(sum(r["neyman_share"] for r in got.values()) - 1.0) <= 1e-3
    for et in shares.index:
        row = got[et]
        assert row["n_rows"] == int(n[et])
        assert abs(row["neyman_share"] - round(float(shares[et]), 4)) <= 1e-9
        assert abs(row["std_dollars"] - round(float(s[et]) / 100, 4)) <= 1e-4
        assert (
            abs(row["alloc_rows"] - round(NEYMAN_BUDGET * float(shares[et]), 2))
            <= 0.02
        )


def test_range_splits_exact_tiles_are_balanced_and_ordered(spark):
    """ntile semantics: split sizes differ by at most 1 (first tiles get
    the remainder), ranges tile the price axis in order, and the row
    total is conserved."""
    from realtime_twitter_trends_analytics_spark.operators.layout import (
        RANGE_SPLITS,
        layout_range_splits,
    )

    rows = sorted(
        layout_range_splits(spark, SF).collect(), key=lambda r: r["split_id"]
    )
    assert [r["split_id"] for r in rows] == list(range(1, RANGE_SPLITS + 1))
    total = sum(r["n_rows"] for r in rows)
    lineitem = pd.read_parquet(f"{SF}/lineitem.parquet")
    assert total == len(lineitem)
    base, rem = divmod(total, RANGE_SPLITS)
    for i, r in enumerate(rows):
        assert r["n_rows"] == base + (1 if i < rem else 0)
    for a, b in zip(rows, rows[1:]):
        assert a["hi_cents"] <= b["lo_cents"]


def test_uplift_by_tier_matches_pandas_recompute(spark):
    """Arm sizes, conversion counts, and uplift per tier equal a direct
    pandas recomputation of the time-split + hash-coin + Benford-band
    pipeline."""
    import hashlib
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        UPLIFT_OUTCOME,
        events_uplift_by_tier,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf.assign(
        di=_day_index(pdf["ts"]),
        cents=np.round(pdf["value"] * 100).astype("int64"),
    )
    split = (int(pdf["di"].min()) + int(pdf["di"].max()) + 1) // 2
    pre = pdf[pdf["di"] < split].groupby("user_id")["cents"].sum()
    post = (
        pdf[pdf["di"] >= split]
        .assign(conv=(pdf["event_type"] == UPLIFT_OUTCOME).astype(int))
        .groupby("user_id")["conv"]
        .max()
    )
    rows = []
    for uid in pdf["user_id"].unique():
        pc = int(pre.get(uid, 0))
        conv = int(post.get(uid, 0))
        nib = int(hashlib.md5(str(uid).encode()).hexdigest()[0], 16)
        arm = "control" if nib < 8 else "treat"
        tier = -1 if pc == 0 else 9 * (len(str(pc)) - 1) + int(str(pc)[0]) - 1
        rows.append((tier, arm, conv))
    ref = pd.DataFrame(rows, columns=["tier", "arm", "conv"])
    got = {r["tier"]: r for r in events_uplift_by_tier(spark, SF).collect()}
    for tier, sub in ref.groupby("tier"):
        t = sub[sub["arm"] == "treat"]
        c = sub[sub["arm"] == "control"]
        if len(t) == 0 or len(c) == 0:
            assert tier not in got
            continue
        row = got[tier]
        assert row["n_t"] == len(t) and row["n_c"] == len(c)
        assert row["conv_t"] == int(t["conv"].sum())
        assert row["conv_c"] == int(c["conv"].sum())
        uplift_ref = round(
            round(t["conv"].sum() / len(t), 4) - round(c["conv"].sum() / len(c), 4), 4
        )
        assert abs(row["uplift"] - uplift_ref) <= 2e-4


def test_markov_stationary_is_eigenvector_of_transition_matrix(spark):
    """The fixed-point iterate converges (within quantization leak) to
    the true stationary eigenvector of the empirical transition matrix,
    computed independently in numpy float."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        events_markov_stationary,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    pdf = pdf.assign(nxt=pdf.groupby("user_id")["event_type"].shift(-1))
    pairs = pdf.dropna(subset=["nxt"])
    states = sorted(set(pairs["event_type"]) | set(pairs["nxt"]))
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    P = np.zeros((k, k))
    for (s, t), n in pairs.groupby(["event_type", "nxt"]).size().items():
        P[idx[s], idx[t]] = n
    P = P / P.sum(axis=1, keepdims=True)
    v = np.full(k, 1.0 / k)
    for _ in range(200):
        v = v @ P
    v = v / v.sum()
    got = {r["state"]: r for r in events_markov_stationary(spark, SF).collect()}
    assert set(got) == set(states)
    mass_total = sum(r["mass"] for r in got.values())
    # two leak channels, both deterministic: each row of p6 sums to at
    # most 1e6 (short by < K quantization units -> ~K/1e6 mass lost per
    # round, ~1.5e-4 over 30 rounds at K=5), plus DIV flooring.
    # Invisible at the 4dp readout; bounded here.
    assert 1 - mass_total / 10**12 < 1e-3
    for s in states:
        assert abs(got[s]["stationary_share"] - v[idx[s]]) <= 5e-3, (
            s,
            got[s]["stationary_share"],
            v[idx[s]],
        )


def test_diff_in_diff_matches_pandas_2x2(spark):
    """Cell means, DiD, SE, and t match a direct pandas computation of
    the 2x2 design."""
    import hashlib
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        events_diff_in_diff,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf.assign(
        di=_day_index(pdf["ts"]),
        cents=np.round(pdf["value"] * 100).astype("int64"),
    )
    split = (int(pdf["di"].min()) + int(pdf["di"].max()) + 1) // 2
    pdf = pdf.assign(
        arm=pdf["user_id"].map(
            lambda u: "c" if int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) < 8 else "t"
        ),
        period=np.where(pdf["di"] < split, "pre", "post"),
    )
    cells = {}
    for (a, p), sub in pdf.groupby(["arm", "period"]):
        x = sub["cents"].to_numpy(dtype=np.float64)
        cells[(a, p)] = (len(x), x.mean(), x.var(ddof=1))
    row = events_diff_in_diff(spark, SF).collect()[0]
    assert row["n_tpr"] == cells[("t", "pre")][0]
    assert row["n_cpo"] == cells[("c", "post")][0]
    assert abs(row["mean_t_pre"] - round(cells[("t", "pre")][1] / 100, 4)) <= 1e-3
    did = (cells[("t", "post")][1] - cells[("t", "pre")][1]) - (
        cells[("c", "post")][1] - cells[("c", "pre")][1]
    )
    se = np.sqrt(sum(v / n for (n, m, v) in cells.values()))
    assert abs(row["did_dollars"] - round(did / 100, 4)) <= 1e-3
    assert abs(row["se_dollars"] - round(se / 100, 4)) <= 1e-3
    assert abs(row["t_stat"] - round(did / se, 4)) <= 1e-3


def test_partition_skew_matches_python_hash_assignment(spark):
    """Loads per candidate width match a python md5 recomputation, and
    the straggler factor is max*P/total."""
    import hashlib
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        SKEW_PARTITION_COUNTS,
        layout_partition_skew,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    got = {r["n_partitions"]: r for r in layout_partition_skew(spark, SF).collect()}
    assert set(got) == set(SKEW_PARTITION_COUNTS)
    for p in SKEW_PARTITION_COUNTS:
        loads: dict[int, int] = {}
        for u in pdf["user_id"]:
            h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % p
            loads[h] = loads.get(h, 0) + 1
        row = got[p]
        assert row["used_partitions"] == len(loads)
        assert row["total_rows"] == len(pdf)
        assert row["max_load"] == max(loads.values())
        assert row["min_load"] == min(loads.values())
        sf_ref = round(max(loads.values()) * p / len(pdf), 4)
        assert abs(row["straggler_factor"] - sf_ref) <= 1e-9


def test_watermark_lateness_matches_pandas_running_max(spark):
    """Bucket counts match a per-user arrival-ordered running-max
    recomputation with the same deterministic jitter."""
    import hashlib
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        LATE_BUCKET_CAP,
        LATE_BUCKET_SEC,
        LATE_JITTER_SEC,
        events_watermark_lateness,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    ts = pdf["ts"]
    secs = (
        ts // 1_000_000_000
        if ts.dtype.kind in "iu"
        else ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000
    )
    pdf = pdf.assign(
        sec=secs,
        arr=secs
        + pdf["event_id"].map(
            lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[0], 16)
        )
        * LATE_JITTER_SEC,
    )
    buckets: dict[int, int] = {}
    for _, sub in pdf.groupby("user_id"):
        sub = sub.sort_values(["arr", "event_id"])
        runmax = sub["sec"].cummax()
        for late in (runmax - sub["sec"]).astype("int64"):
            b = min(late // LATE_BUCKET_SEC, LATE_BUCKET_CAP)
            buckets[b] = buckets.get(b, 0) + 1
    got = {r["late_hour_bucket"]: r for r in events_watermark_lateness(spark, SF).collect()}
    assert {k: v for k, v in buckets.items()} == {
        k: r["n_events"] for k, r in got.items()
    }
    assert abs(sum(r["share"] for r in got.values()) - 1.0) <= 1e-2


def test_assortativity_matches_numpy_pearson_on_edges(spark):
    """r equals the numpy Pearson correlation of endpoint degrees over
    the same symmetrized edge list (edges pulled from the shared cooc
    staging relation; the edge build itself is oracle-gated
    elsewhere)."""
    from realtime_twitter_trends_analytics_spark.operators.graph import (
        _cooc_edges,
        graph_degree_assortativity,
    )

    edges = [(r["tok_a"], r["tok_b"]) for r in _cooc_edges(spark, SF).collect()]
    deg: dict[str, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    x = np.array(xs, dtype=np.float64)
    y = np.array(ys, dtype=np.float64)
    r_ref = np.corrcoef(x, y)[0, 1]
    row = graph_degree_assortativity(spark, SF).collect()[0]
    assert row["n_directed_edges"] == 2 * len(edges)
    assert abs(row["assortativity_r"] - round(float(r_ref), 4)) <= 1e-3
    assert abs(row["mean_endpoint_degree"] - round(float(x.mean()), 4)) <= 1e-3


def test_stump_cv_matches_numpy_fold_recompute(spark):
    """Per-fold chosen split and gains match a direct numpy histogram
    recomputation: train impurity minimized over (dim, bin) with
    dim/bin tie-break, gains measured on train and held-out fold."""
    import hashlib
    from realtime_twitter_trends_analytics_spark.operators.ml import (
        CV_FOLDS,
        STUMP_BIN_SCALE,
        STUMP_DIMS,
        ml_stump_cv_gain,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    folds = emb["vec_id"].map(
        lambda v: int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % CV_FOLDS
    )
    labels = emb["label"].to_numpy()
    vecs = np.stack(emb["embedding"].to_numpy())[:, :STUMP_DIMS]
    bins = np.floor(vecs * STUMP_BIN_SCALE).astype(np.int64)

    def weighted_gini(lab):
        if len(lab) == 0:
            return 0.0
        _, c = np.unique(lab, return_counts=True)
        return len(lab) - (c.astype(np.float64) ** 2).sum() / len(lab)

    got = {r["fold"]: r for r in ml_stump_cv_gain(spark, SF).collect()}
    for f in range(CV_FOLDS):
        tr = (folds != f).to_numpy()
        te = ~tr
        best = None
        for dim in range(STUMP_DIMS):
            for b in sorted(set(bins[:, dim])):
                left = bins[:, dim] <= b
                nl = int((tr & left).sum())
                if nl == 0 or nl == int(tr.sum()):
                    continue
                imp = (
                    weighted_gini(labels[tr & left])
                    + weighted_gini(labels[tr & ~left])
                ) / tr.sum()
                key = (round(imp * 10**9), dim, b)
                if best is None or key < best:
                    best = key
        imp_q, dim, b = best
        row = got[f]
        assert (row["dim"], row["split_bin"]) == (dim, b), (f, row, best)
        left = bins[:, dim] <= b
        gb_tr = weighted_gini(labels[tr]) / tr.sum()
        tr_gain = gb_tr - imp_q / 10**9
        gb_te = weighted_gini(labels[te]) / te.sum()
        te_imp = (
            weighted_gini(labels[te & left]) + weighted_gini(labels[te & ~left])
        ) / te.sum()
        assert abs(row["train_gain"] - tr_gain) <= 1e-6, (f, row["train_gain"], tr_gain)
        assert abs(row["test_gain"] - (gb_te - te_imp)) <= 1e-6
        assert abs(row["overfit_gap"] - (tr_gain - (gb_te - te_imp))) <= 1e-6
        assert row["n_train"] == int(tr.sum())
        assert row["n_test"] == int(te.sum())


def test_modularity_matches_numpy_formula(spark):
    """Q equals the Newman closed form recomputed in python from the
    same edges and LPA labels."""
    from realtime_twitter_trends_analytics_spark.operators.graph import (
        _cooc_edges,
        _lpa_labels,
        graph_modularity,
    )

    labels = {r["node"]: r["label"] for r in _lpa_labels(spark, SF).collect()}
    edges = [
        (r["tok_a"], r["tok_b"], r["w"]) for r in _cooc_edges(spark, SF).collect()
    ]
    m = sum(w for _, _, w in edges)
    in_w = sum(w for a, b, w in edges if labels[a] == labels[b])
    deg: dict[str, int] = {}
    for a, b, w in edges:
        deg[labels[a]] = deg.get(labels[a], 0) + w
        deg[labels[b]] = deg.get(labels[b], 0) + w
    sum_deg_sq = sum(v * v for v in deg.values())
    q_ref = in_w / m - sum_deg_sq / (4.0 * m * m)
    row = graph_modularity(spark, SF).collect()[0]
    assert row["total_edge_weight"] == m
    assert row["intra_weight"] == in_w
    assert row["sum_deg_sq"] == sum_deg_sq
    assert row["n_communities"] == len(set(labels.values()))
    assert abs(row["modularity_q"] - round(q_ref, 4)) <= 1e-9


def test_lsh_tuning_curve_matches_s_curve_math(spark):
    """Expected recall per (b, r) equals the mean S-curve detection
    probability over the verified pairs' jaccards, and s50 solves
    1-(1-s^r)^b = 1/2."""
    from realtime_twitter_trends_analytics_spark.operators.dedup import (
        LSH_TUNE_GRID,
        dedup_lsh_tuning_curve,
        dedup_ngram_jaccard,
    )

    sims = [r["jaccard"] for r in dedup_ngram_jaccard(spark, SF).collect()]
    got = {(r["bands"], r["rows_per_band"]): r for r in dedup_lsh_tuning_curve(spark, SF).collect()}
    assert set(got) == set(LSH_TUNE_GRID)
    for b, r in LSH_TUNE_GRID:
        probs = [
            round(1.0 - (1.0 - s**r) ** b, 8) for s in sims
        ]
        row = got[(b, r)]
        assert row["n_pairs"] == len(sims)
        assert abs(row["expected_recall"] - round(sum(probs) / len(probs), 4)) <= 2e-4
        assert abs(row["worst_pair_prob"] - round(min(probs), 4)) <= 1e-4
        s50 = row["s50"]
        assert abs((1.0 - (1.0 - s50**r) ** b) - 0.5) <= 1e-3
        assert row["n_above_90"] == sum(1 for p in probs if p >= 0.9)


def test_ar_aging_matches_pandas_buckets(spark):
    """Open-order bucket counts and dollar totals match a pandas
    recomputation against the dataset's own snapshot day."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        AGING_BANDS,
        orders_ar_aging,
    )

    pdf = pd.read_parquet(f"{SF}/orders.parquet")
    pdf = pdf.assign(
        di=_day_index(pdf["o_orderdate"]),
        cents=np.round(pdf["o_totalprice"] * 100).astype("int64"),
    )
    snap = int(pdf["di"].max())
    b1, b2, b3 = AGING_BANDS

    def band(age: int) -> str:
        if age <= b1:
            return f"00-{b1}"
        if age <= b2:
            return f"{b1 + 1}-{b2}"
        if age <= b3:
            return f"{b2 + 1}-{b3}"
        return f"{b3}+"

    open_ = pdf[pdf["o_orderstatus"] != "F"].assign(
        age_band=lambda d: (snap - d["di"]).map(band)
    )
    ref = open_.groupby(["o_orderstatus", "age_band"]).agg(
        n_open=("cents", "count"), open_cents=("cents", "sum")
    )
    got = {
        (r["o_orderstatus"], r["age_band"]): r
        for r in orders_ar_aging(spark, SF).collect()
    }
    assert set(got) == set(ref.index)
    tot = open_["cents"].sum()
    for key, row in ref.iterrows():
        g = got[key]
        assert g["n_open"] == row["n_open"]
        assert abs(g["open_dollars"] - round(row["open_cents"] / 100, 2)) <= 0.01
        assert abs(g["share_of_open"] - round(row["open_cents"] / tot, 4)) <= 1e-4


def test_discount_bands_match_pandas(spark):
    """Band totals and the realized ratio match pandas exact-integer
    recomputation."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        lineitem_discount_bands,
    )

    pdf = pd.read_parquet(f"{SF}/lineitem.parquet")
    pdf = pdf.assign(
        disc=np.round(pdf["l_discount"] * 100).astype("int64"),
        qty=np.round(pdf["l_quantity"]).astype("int64"),
        gross=np.round(pdf["l_extendedprice"] * 100).astype("int64"),
    )
    pdf = pdf.assign(net_x100=pdf["gross"] * (100 - pdf["disc"]))
    ref = pdf.groupby("disc").agg(
        n=("qty", "count"),
        qty=("qty", "sum"),
        gross=("gross", "sum"),
        net=("net_x100", "sum"),
    )
    got = {r["disc_pct"]: r for r in lineitem_discount_bands(spark, SF).collect()}
    assert set(got) == set(int(i) for i in ref.index)
    for disc, row in ref.iterrows():
        g = got[int(disc)]
        assert g["n_lines"] == row["n"] and g["total_qty"] == row["qty"]
        # 0.011: python round() is banker's; the engines round half-up, so
        # an exact .005 tie (observed live: 287875037450/10000) differs by
        # one cent between the mirror and both engines
        assert abs(g["gross_dollars"] - round(row["gross"] / 100, 2)) <= 0.011
        assert abs(g["net_dollars"] - round(row["net"] / 10000, 2)) <= 0.011
        assert abs(g["realized_ratio"] - round(row["net"] / (row["gross"] * 100), 4)) <= 1e-4


def test_srm_check_matches_chi_square(spark):
    """Arm counts come from the same md5 coin and the chi-square and
    verdict match the textbook computation."""
    import hashlib
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        events_ab_srm_check,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    arms = {
        u: ("A" if int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) < 8 else "B")
        for u in pdf["user_id"].unique()
    }
    n_a = sum(1 for a in arms.values() if a == "A")
    n_b = len(arms) - n_a
    chi2 = (n_a - n_b) ** 2 / (n_a + n_b)
    row = events_ab_srm_check(spark, SF).collect()[0]
    assert row["n_a"] == n_a and row["n_b"] == n_b
    assert abs(row["chi2_stat"] - round(chi2, 4)) <= 1e-9
    assert row["srm_ok"] == (chi2 <= 3.841459)


def test_pr_auc_block_ap_matches_numpy(spark):
    """Block-form AP per dow equals a direct numpy recomputation:
    descending-score tied blocks, precision at inclusive block
    boundaries weighted by block positives."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        AP_POS_TYPE,
        ml_pr_auc,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf.assign(
        cents=np.round(pdf["value"] * 100).astype("int64"),
        dow=(_day_index(pdf["ts"]) + 4) % 7,
        p=(pdf["event_type"] == AP_POS_TYPE).astype(int),
    )
    got = {r["dow"]: r for r in ml_pr_auc(spark, SF).collect()}
    for dow, sub in pdf.groupby("dow"):
        cells = (
            sub.groupby("cents")["p"]
            .agg(cp="sum", n="count")
            .sort_index(ascending=False)
        )
        cum_pos = cells["cp"].cumsum()
        cum_all = cells["n"].cumsum()
        np_tot = int(cells["cp"].sum())
        if np_tot == 0:
            assert dow not in got
            continue
        terms = [
            round(cp * (int(cpos) / int(call)) * 10**9)
            for cp, cpos, call in zip(cells["cp"], cum_pos, cum_all)
        ]
        ap_ref = sum(terms) / np_tot / 10**9
        row = got[dow]
        assert row["n_pos"] == np_tot
        assert abs(row["avg_precision"] - round(ap_ref, 4)) <= 1e-9
        prev = np_tot / len(sub)
        assert abs(row["prevalence"] - round(prev, 4)) <= 1e-4
        assert abs(row["ap_lift"] - round(ap_ref / prev, 4)) <= 1e-3


def test_otif_scorecard_matches_pandas_join(spark):
    """Supplier rows equal a pandas merge + groupby recomputation, in
    revenue order."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        OTIF_LEAD_DAYS,
        OTIF_TOP,
        supplier_otif_scorecard,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    li = li.assign(
        ship_di=_day_index(li["l_shipdate"]),
        cents=np.round(li["l_extendedprice"] * 100).astype("int64"),
    )
    o = o.assign(ord_di=_day_index(o["o_orderdate"]))
    j = li.merge(
        o[["o_orderkey", "ord_di"]], left_on="l_orderkey", right_on="o_orderkey"
    )
    j = j.assign(lead=j["ship_di"] - j["ord_di"])
    g = j.groupby("l_suppkey").agg(
        n=("cents", "count"),
        rev=("cents", "sum"),
        lead_sum=("lead", "sum"),
        late=("lead", lambda x: int((x > OTIF_LEAD_DAYS).sum())),
    )
    top = g.sort_values(["rev", "l_suppkey"], ascending=[False, True]).head(OTIF_TOP)
    got = supplier_otif_scorecard(spark, SF).collect()
    assert len(got) == min(OTIF_TOP, len(g))
    for row, (supp, ref) in zip(got, top.iterrows()):
        assert row["l_suppkey"] == supp
        assert row["n_lines"] == ref["n"]
        assert abs(row["revenue_dollars"] - round(ref["rev"] / 100, 2)) <= 0.011
        assert abs(row["mean_lead_days"] - round(ref["lead_sum"] / ref["n"], 2)) <= 0.011
        assert abs(row["late_share"] - round(ref["late"] / ref["n"], 4)) <= 1e-4


def test_monthly_yoy_matches_pandas(spark):
    """Monthly revenue and the 12-month-lag YoY percentage match pandas;
    months with no same-month-last-year comparison report NULL."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        orders_monthly_yoy,
    )

    pdf = pd.read_parquet(f"{SF}/orders.parquet")
    od = pd.to_datetime(pdf["o_orderdate"])
    pdf = pdf.assign(
        ym=od.dt.year * 12 + od.dt.month - 1,
        cents=np.round(pdf["o_totalprice"] * 100).astype("int64"),
    )
    g = pdf.groupby("ym").agg(n=("cents", "count"), rev=("cents", "sum"))
    got = {(r["year"], r["month"]): r for r in orders_monthly_yoy(spark, SF).collect()}
    assert len(got) == len(g)
    for ym, row in g.iterrows():
        key = (ym // 12, ym % 12 + 1)
        r = got[key]
        assert r["n_orders"] == row["n"]
        assert abs(r["revenue_dollars"] - round(row["rev"] / 100, 2)) <= 0.011
        if ym - 12 in g.index and g.loc[ym - 12, "rev"] != 0:
            prev = g.loc[ym - 12, "rev"]
            ref = round(abs(row["rev"] - prev) * 100 / prev, 2)
            ref = ref if row["rev"] >= prev else -ref
            assert abs(r["yoy_pct"] - ref) <= 0.011, (key, r["yoy_pct"], ref)
        else:
            assert r["yoy_pct"] is None


def test_velocity_flags_match_pandas(spark):
    """Flagged users, tripped-hour counts, and worst hours match a
    pandas user-hour recomputation."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        VELOCITY_PER_HOUR,
        events_velocity_flags,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    ts = pdf["ts"]
    secs = (
        ts // 1_000_000_000
        if ts.dtype.kind in "iu"
        else ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000
    )
    pdf = pdf.assign(hi=secs // 3600)
    uh = pdf.groupby(["user_id", "hi"]).size()
    tripped = uh[uh > VELOCITY_PER_HOUR]
    ref = tripped.groupby(level=0).agg(["count", "max"])
    tot = pdf.groupby("user_id").size()
    got = {r["user_id"]: r for r in events_velocity_flags(spark, SF).collect()}
    assert set(got) == set(ref.index)
    for uid, row in ref.iterrows():
        g = got[uid]
        assert g["hours_tripped"] == row["count"]
        assert g["worst_hour_events"] == row["max"]
        assert g["n_events"] == int(tot[uid])
        assert abs(g["share_of_corpus"] - round(int(tot[uid]) / len(pdf), 4)) <= 1e-4


def test_kmeans_silhouette_matches_numpy(spark):
    """Per-cluster simplified silhouette equals a numpy recomputation
    against the same trained fixed-point centroids."""
    from realtime_twitter_trends_analytics_spark.operators.ml import (
        KMEANS_SCALE,
        kmeans_centroid_rows,
        ml_kmeans_silhouette,
    )

    cents = {cl: np.array(c, dtype=np.int64) for cl, c in kmeans_centroid_rows(spark, SF)}
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    sums: dict[int, list] = {}
    for vec in emb["embedding"]:
        qe = np.round(np.asarray(vec, dtype=np.float64) * KMEANS_SCALE).astype(np.int64)
        d2 = sorted(
            (int(((qe - c) ** 2).sum()), cl) for cl, c in cents.items()
        )
        (a2, cl), (b2, _) = d2[0], d2[1]
        if a2 == 0 and b2 == 0:
            s = 0.0
        else:
            s = (np.sqrt(b2) - np.sqrt(a2)) / max(np.sqrt(a2), np.sqrt(b2))
        acc = sums.setdefault(cl, [0, 0])
        acc[0] += 1
        acc[1] += round(s * 10**9)
    got = {r["cluster"]: r for r in ml_kmeans_silhouette(spark, SF).collect()}
    assert set(got) == set(sums)
    for cl, (n, sq) in sums.items():
        row = got[cl]
        assert row["n_vecs"] == n
        assert abs(row["mean_silhouette"] - round(sq / n / 10**9, 4)) <= 1e-9


def test_churn_sensitivity_matches_pandas(spark):
    """Churn rates per horizon equal the pandas last-activity
    recomputation, and the rate is monotone non-increasing in the
    horizon."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        CHURN_HORIZONS,
        events_churn_sensitivity,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf.assign(di=_day_index(pdf["ts"]))
    last = pdf.groupby("user_id")["di"].max()
    snap = int(pdf["di"].max())
    idle = snap - last
    got = {r["horizon_days"]: r for r in events_churn_sensitivity(spark, SF).collect()}
    assert set(got) == set(CHURN_HORIZONS)
    rates = []
    for h in sorted(CHURN_HORIZONS):
        row = got[h]
        churned = int((idle > h).sum())
        assert row["n_users"] == len(idle)
        assert row["churned"] == churned
        assert abs(row["churn_rate"] - round(churned / len(idle), 4)) <= 1e-9
        rates.append(row["churn_rate"])
    assert all(a >= b for a, b in zip(rates, rates[1:]))


def test_hhi_matches_pandas(spark):
    """Per-brand HHI, supplier counts, and top share equal a pandas
    merge + share recomputation; HHI is bounded by [1/n, 1]."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        parts_supplier_hhi,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    pt = pd.read_parquet(f"{SF}/part.parquet")
    li = li.assign(cents=np.round(li["l_extendedprice"] * 100).astype("int64"))
    j = li.merge(pt[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    bs = j.groupby(["p_brand", "l_suppkey"])["cents"].sum()
    got = {r["p_brand"]: r for r in parts_supplier_hhi(spark, SF).collect()}
    brands = bs.index.get_level_values(0).unique()
    assert set(got) == set(brands)
    for brand in brands:
        revs = bs[brand]
        tot = revs.sum()
        hhi = float((revs.astype("float64") ** 2).sum() / (float(tot) * tot))
        row = got[brand]
        assert row["n_suppliers"] == len(revs)
        assert abs(row["hhi"] - round(hhi, 4)) <= 1e-9
        assert abs(row["top_supplier_share"] - round(revs.max() / tot, 4)) <= 1e-4
        assert 1 / len(revs) - 1e-4 <= row["hhi"] <= 1 + 1e-9


def test_basket_size_dist_matches_pandas(spark):
    """Histogram counts/shares/revenue equal the pandas order-grain
    recomputation, and shares sum to ~1."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        orders_basket_size_dist,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li.assign(cents=np.round(li["l_extendedprice"] * 100).astype("int64"))
    per = li.groupby("l_orderkey").agg(sz=("cents", "count"), rev=("cents", "sum"))
    ref = per.groupby("sz").agg(n=("rev", "count"), rev=("rev", "sum"))
    got = {r["basket_size"]: r for r in orders_basket_size_dist(spark, SF).collect()}
    assert set(got) == set(ref.index)
    tot = len(per)
    for sz, row in ref.iterrows():
        g = got[sz]
        assert g["n_orders"] == row["n"]
        assert abs(g["order_share"] - round(row["n"] / tot, 4)) <= 1e-9
        assert abs(g["revenue_dollars"] - round(row["rev"] / 100, 2)) <= 0.011
    assert abs(sum(r["order_share"] for r in got.values()) - 1.0) <= 1e-3


def test_welch_ttest_matches_scipy_free_formula(spark):
    """t, Welch-Satterthwaite dof, and Cohen's d match the textbook
    formulas computed independently in numpy per event type."""
    import hashlib
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        stats_welch_ttest,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf.assign(
        cents=np.round(pdf["value"] * 100).astype("int64"),
        arm=pdf["user_id"].map(
            lambda u: "A" if int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) < 8 else "B"
        ),
    )
    got = {r["event_type"]: r for r in stats_welch_ttest(spark, SF).collect()}
    for et, sub in pdf.groupby("event_type"):
        a = sub.loc[sub["arm"] == "A", "cents"].to_numpy(dtype=np.float64)
        b = sub.loc[sub["arm"] == "B", "cents"].to_numpy(dtype=np.float64)
        if len(a) < 2 or len(b) < 2:
            assert et not in got
            continue
        va, vb = a.var(ddof=1), b.var(ddof=1)
        na, nb = len(a), len(b)
        se2 = va / na + vb / nb
        t = (b.mean() - a.mean()) / np.sqrt(se2)
        dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
        sp = np.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
        d = (b.mean() - a.mean()) / sp
        row = got[et]
        assert row["na"] == na and row["nb"] == nb
        assert abs(row["welch_t"] - round(float(t), 4)) <= 1e-3
        assert abs(row["welch_dof"] - round(float(dof), 2)) <= 0.02
        assert abs(row["cohens_d"] - round(float(d), 4)) <= 1e-3


def test_pruning_advisor_matches_pandas_file_model(spark):
    """Per-candidate file-touch stats equal the pandas (value, hour-file)
    recomputation; event_type (low cardinality, spread everywhere) must
    skip less than user_id."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        layout_pruning_advisor,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    ts = pdf["ts"]
    secs = (
        ts // 1_000_000_000
        if ts.dtype.kind in "iu"
        else ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000
    )
    pdf = pdf.assign(file_id=secs // 3600)
    n_files = pdf["file_id"].nunique()
    got = {r["candidate_column"]: r for r in layout_pruning_advisor(spark, SF).collect()}
    for col in ("user_id", "event_type"):
        vf = pdf[[col, "file_id"]].drop_duplicates().groupby(col).size()
        row = got[col]
        assert row["n_values"] == len(vf)
        assert row["n_files"] == n_files
        assert abs(row["avg_files_per_value"] - round(vf.mean(), 2)) <= 0.011
        assert row["max_files"] == int(vf.max())
        skip_ref = (n_files * len(vf) - vf.sum()) / (n_files * len(vf))
        assert abs(row["skip_ratio"] - round(float(skip_ref), 4)) <= 1e-4
    assert got["user_id"]["skip_ratio"] > got["event_type"]["skip_ratio"]


def test_brier_decomposition_identity_and_value(spark):
    """Brier equals the direct mean of (p - o)^2 over queries, and the
    Murphy identity REL - RES + UNC == Brier holds at 4dp."""
    from realtime_twitter_trends_analytics_spark.operators.similarity import (
        KNN_K,
        ml_calibration_brier,
        ml_knn_calibration,
    )

    buckets = ml_knn_calibration(spark, SF).collect()
    terms = []
    for r in buckets:
        p = r["votes_top"] / KNN_K
        terms += [(p - 1) ** 2] * r["n_correct"]
        terms += [(p - 0) ** 2] * (r["n_queries"] - r["n_correct"])
    brier_ref = sum(terms) / len(terms)
    row = ml_calibration_brier(spark, SF).collect()[0]
    assert row["n_queries"] == len(terms)
    assert abs(row["brier"] - round(brier_ref, 4)) <= 1e-4
    assert (
        abs(
            (row["reliability"] - row["resolution"] + row["uncertainty"])
            - row["brier"]
        )
        <= 3e-4
    )
    c = sum(r["n_correct"] for r in buckets)
    n = len(terms)
    assert abs(row["uncertainty"] - round(c / n * (1 - c / n), 4)) <= 1e-4


def test_holt_winters_matches_python_recurrence(spark):
    """Level/trend/season/forecast per type equal a direct python
    implementation of the additive HW recurrence with the same seeds."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        HW_H,
        HW_PERIOD,
        events_holt_winters,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf.assign(day=_day_index(pdf["ts"]))
    a, b, g = 0.3, 0.1, 0.2
    m = HW_PERIOD
    got = {r["event_type"]: r for r in events_holt_winters(spark, SF).collect()}
    for et, sub in pdf.groupby("event_type"):
        xs = sub.groupby("day").size().sort_index().astype(float).tolist()
        if len(xs) < m + 1:
            assert et not in got
            continue
        L = 0.0
        for v in xs[:m]:
            L = L + v
        L /= float(m)
        B = 0.0
        S = [x - L for x in xs[:m]]
        for x in xs[m:]:
            Lp = a * (x - S[0]) + (1 - a) * (L + B)
            Bp = b * (Lp - L) + (1 - b) * B
            Sp = g * (x - Lp) + (1 - g) * S[0]
            L, B, S = Lp, Bp, S[1:] + [Sp]
        import math

        def q4(v: float) -> float:
            return math.floor(v * 10000) / 10000

        row = got[et]
        assert row["n_days"] == len(xs)
        assert abs(row["level"] - q4(L)) <= 2e-4
        assert abs(row["trend"] - q4(B)) <= 2e-4
        assert abs(row["season_last"] - q4(S[-1])) <= 2e-4
        assert abs(row[f"forecast_{HW_H}d"] - q4(L + HW_H * B + S[-1])) <= 4e-4


def test_its_matches_numpy_two_fits(spark):
    """Pre/post slopes and the level jump equal two independent numpy
    polyfits on the same centered day series."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        events_interrupted_time_series,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf.assign(
        di=_day_index(pdf["ts"]),
        cents=np.round(pdf["value"] * 100).astype("int64"),
    )
    day = pdf.groupby("di")["cents"].sum()
    sd = (int(day.index.min()) + int(day.index.max()) + 1) // 2
    t = day.index.to_numpy(dtype=np.float64) - sd
    y = day.to_numpy(dtype=np.float64)
    pre, post = t < 0, t >= 0
    bp, ap_ = np.polyfit(t[pre], y[pre], 1)
    bq, aq = np.polyfit(t[post], y[post], 1)
    row = events_interrupted_time_series(spark, SF).collect()[0]
    assert row["split_day_index"] == sd
    assert row["n_pre"] == int(pre.sum()) and row["n_post"] == int(post.sum())
    assert abs(row["slope_pre"] - round(bp / 100, 4)) <= 1e-3
    assert abs(row["slope_post"] - round(bq / 100, 4)) <= 1e-3
    assert abs(row["slope_change"] - round((bq - bp) / 100, 4)) <= 2e-3
    assert abs(row["level_jump_dollars"] - round((aq - ap_) / 100, 2)) <= 0.02


def test_ingest_gap_audit_matches_pandas(spark):
    """The widest per-type hourly gaps equal a pandas lag recomputation
    with the same deterministic ordering."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        GAP_TOP,
        events_ingest_gap_audit,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    ts = pdf["ts"]
    secs = (
        ts // 1_000_000_000
        if ts.dtype.kind in "iu"
        else ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000
    )
    pdf = pdf.assign(hi=secs // 3600)
    gaps = []
    for et, sub in pdf.groupby("event_type"):
        hs = sorted(sub["hi"].unique())
        for a, b in zip(hs, hs[1:]):
            if b - a > 1:
                gaps.append((et, a + 1, b - 1, b - a - 1))
    gaps.sort(key=lambda g: (-g[3], g[0], g[1]))
    ref = gaps[:GAP_TOP]
    got = [
        (r["event_type"], r["gap_start_hour"], r["gap_end_hour"], r["gap_hours"])
        for r in events_ingest_gap_audit(spark, SF).collect()
    ]
    assert got == ref


def test_drawdown_matches_pandas_running_peak(spark):
    """Worst drawdown, its trough day, and the end-of-series drawdown
    equal the pandas cummax recomputation."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        orders_revenue_drawdown,
    )

    pdf = pd.read_parquet(f"{SF}/orders.parquet")
    pdf = pdf.assign(
        di=_day_index(pdf["o_orderdate"]),
        cents=np.round(pdf["o_totalprice"] * 100).astype("int64"),
    )
    day = pdf.groupby("di")["cents"].sum().sort_index()
    cum = day.cumsum()
    peak = cum.cummax()
    dd = peak - cum
    worst_di = dd[dd == dd.max()].index.min()
    row = orders_revenue_drawdown(spark, SF).collect()[0]
    assert row["trough_day_index"] == worst_di
    assert abs(row["worst_drawdown_dollars"] - round(dd.max() / 100, 2)) <= 0.011
    assert abs(row["peak_cum_dollars"] - round(peak[worst_di] / 100, 2)) <= 0.011
    assert abs(row["current_drawdown_dollars"] - round(dd.iloc[-1] / 100, 2)) <= 0.011


def test_fh_tradeoff_matches_python_and_is_monotone(spark):
    """Collision shares per dimension match a python recomputation and
    decrease as the width grows."""
    import hashlib
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        FH_SWEEP_DIMS,
        ml_feature_hash_tradeoff,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    vocab = {w for text in docs["text"] for w in text.split()}
    h8s = [int(hashlib.md5(w.encode()).hexdigest()[:8], 16) for w in vocab]
    got = {r["dim"]: r for r in ml_feature_hash_tradeoff(spark, SF).collect()}
    assert set(got) == set(FH_SWEEP_DIMS)
    shares = []
    for d in FH_SWEEP_DIMS:
        counts: dict[int, int] = {}
        for h in h8s:
            counts[h % d] = counts.get(h % d, 0) + 1
        colliding = sum(c for c in counts.values() if c > 1)
        row = got[d]
        assert row["n_vocab"] == len(vocab)
        assert row["buckets_used"] == len(counts)
        assert row["max_bucket_tokens"] == max(counts.values())
        assert abs(row["collision_share"] - round(colliding / len(vocab), 4)) <= 1e-4
        shares.append(row["collision_share"])
    assert shares == sorted(shares, reverse=True)


def test_session_depth_matches_pandas_sessionizer(spark):
    """Depth histogram equals a pandas 30-minute-gap sessionizer."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        SESSION_GAP_MIN,
        events_session_depth_dist,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    ts = pdf["ts"]
    secs = (
        ts // 1_000_000_000
        if ts.dtype.kind in "iu"
        else ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000
    )
    pdf = pdf.assign(sec=secs).sort_values(["user_id", "sec", "event_id"])
    depths: dict[int, int] = {}
    for _, sub in pdf.groupby("user_id"):
        gap = sub["sec"].diff()
        new = (gap.isna()) | (gap > SESSION_GAP_MIN * 60)
        sid = new.cumsum()
        for d in sub.groupby(sid).size():
            depths[d] = depths.get(d, 0) + 1
    got = {r["depth"]: r for r in events_session_depth_dist(spark, SF).collect()}
    assert {k: v for k, v in depths.items()} == {
        k: r["n_sessions"] for k, r in got.items()
    }
    tot = sum(depths.values())
    for d, r in got.items():
        assert abs(r["session_share"] - round(depths[d] / tot, 4)) <= 1e-9


def test_mmr_diversity_eval_shows_diversification(spark):
    """MMR's intra-set cosine must not exceed the relevance top-k's (the
    property the operator exists to buy), pair counts equal K*(K-1)/2
    per query, and the shared-picks count is below the full overlap."""
    from realtime_twitter_trends_analytics_spark.operators.similarity import (
        sim_mmr_diversity_eval,
    )

    rows = {r["method"]: r for r in sim_mmr_diversity_eval(spark, SF).collect()}
    assert set(rows) == {"mmr", "relevance_topk"}
    m, t = rows["mmr"], rows["relevance_topk"]
    assert m["n_queries"] == t["n_queries"]
    assert m["sum_pairs"] == t["sum_pairs"]
    assert m["mean_intra_cosine"] <= t["mean_intra_cosine"] + 1e-9
    assert 0 < m["shared"] <= m["n_queries"] * (m["sum_pairs"] // m["n_queries"])


def test_heaps_law_matches_python_loglog_fit(spark):
    """beta and k equal a python recomputation of the same checkpoint
    grid, first-occurrence vocab counts, and quantized log-log OLS."""
    import math
    from realtime_twitter_trends_analytics_spark.operators.textstats import (
        HEAPS_POINTS,
        HEAPS_Q,
        textstats_heaps_law,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    n_docs = int(docs["doc_id"].max()) + 1
    cps = sorted({max(1, (n_docs * i) // HEAPS_POINTS) for i in range(1, HEAPS_POINTS + 1)})
    first: dict[str, int] = {}
    ntok: dict[int, int] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        ws = text.split()
        ntok[did] = len(ws)
        for w in ws:
            if w not in first:
                first[w] = did
    pts = []
    for cp in cps:
        v = sum(1 for d in first.values() if d < cp)
        n = sum(c for d, c in ntok.items() if d < cp)
        if n > 0:
            pts.append((round(math.log(n) * HEAPS_Q), round(math.log(v) * HEAPS_Q)))
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(float(p[0]) * p[1] for p in pts)
    sxx = sum(float(p[0]) * p[0] for p in pts)
    beta = (n * sxy - float(sx) * sy) / (n * sxx - float(sx) * sx)
    k = math.exp((sy - beta * sx) / n / HEAPS_Q)
    row = textstats_heaps_law(spark, SF).collect()[0]
    assert row["n_points"] == n
    assert abs(row["heaps_beta"] - round(beta, 4)) <= 1e-3
    assert abs(row["heaps_k"] - round(k, 4)) <= max(1e-3, 0.01 * k)
    # the synthetic corpus draws from a CLOSED vocabulary, so V(N)
    # saturates within the first checkpoint and beta ~ 0 — the
    # "closed vocabulary" reading the docstring documents; natural text
    # would sit near 0.5
    assert 0 <= row["heaps_beta"] < 1.5


def test_rich_club_matches_python_subgraph_density(spark):
    """phi and the decile cut equal a python recomputation over the
    collected edge list."""
    from realtime_twitter_trends_analytics_spark.operators.graph import (
        RICH_CLUB_PCT,
        _cooc_edges,
        graph_rich_club,
    )

    edges = [(r["tok_a"], r["tok_b"]) for r in _cooc_edges(spark, SF).collect()]
    deg: dict[str, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    nn = len(deg)
    cands = sorted(
        d for d in set(deg.values())
        if sum(1 for x in deg.values() if x >= d) * 100 <= nn * RICH_CLUB_PCT
    )
    row = graph_rich_club(spark, SF).collect()[0]
    assert row["n_nodes"] == nn
    if not cands:
        assert row["n_rich"] == 0 and row["degree_cut"] == -1
        assert row["rich_club_phi"] == 0.0
        return
    cut = cands[0]
    rich = {v for v, d in deg.items() if d >= cut}
    e_r = sum(1 for a, b in edges if a in rich and b in rich)
    assert row["degree_cut"] == cut and row["n_rich"] == len(rich)
    assert row["rich_edges"] == e_r
    if len(rich) >= 2:
        phi = 2 * e_r / (len(rich) * (len(rich) - 1))
        assert abs(row["rich_club_phi"] - round(phi, 4)) <= 1e-4
    dens = 2 * len(edges) / (nn * (nn - 1))
    assert abs(row["graph_density"] - round(dens, 4)) <= 1e-4


def test_skew_kurtosis_matches_scipy_free_moments(spark):
    """g1/g2 per type equal numpy central-moment recomputation."""
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        stats_skew_kurtosis,
    )

    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf.assign(c=np.round(pdf["value"] * 100).astype("int64"))
    got = {r["event_type"]: r for r in stats_skew_kurtosis(spark, SF).collect()}
    for et, sub in pdf.groupby("event_type"):
        x = sub["c"].to_numpy(dtype=np.float64)
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3
        row = got[et]
        assert row["n"] == len(x)
        assert abs(row["skewness_g1"] - round(float(g1), 4)) <= 2e-3
        assert abs(row["excess_kurtosis_g2"] - round(float(g2), 4)) <= 2e-3


def test_lognormal_fit_matches_numpy(spark):
    """mu/sigma of ln(n_chars) per source equal numpy (ddof=1), and the
    implied median matches exp(mu)."""
    import math
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext2 import (
        LOGNORM_Q,
        docs_length_lognormal,
    )

    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    pdf = pdf[pdf["n_chars"] > 0]
    got = {r["source"]: r for r in docs_length_lognormal(spark, SF).collect()}
    for src, sub in pdf.groupby("source"):
        if len(sub) < 2:
            assert src not in got
            continue
        ls = np.array(
            [round(math.log(int(v)) * LOGNORM_Q) for v in sub["n_chars"]],
            dtype=np.float64,
        ) / LOGNORM_Q
        mu, sd = ls.mean(), ls.std(ddof=1)
        row = got[src]
        assert row["n_docs"] == len(sub)
        assert abs(row["mu_log"] - round(float(mu), 4)) <= 1e-3
        assert abs(row["sigma_log"] - round(float(sd), 4)) <= 1e-3
        assert abs(row["implied_median_chars"] - round(math.exp(mu), 2)) <= max(
            0.02, 0.001 * math.exp(mu)
        )
