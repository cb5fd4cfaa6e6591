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
