"""The r14 loader metadata memos: load_table returns a memoized lazy PLAN
(same behavior, no per-call footer/py4j tax) and register_table_view binds
a temp view once per (session, fixture) — and REBINDS when the sf_dir
changes, which the multi-SF test suites depend on."""

import os

import pytest

from realtime_twitter_trends_analytics_spark.sources.loaders import (
    _TABLE_PLAN_MEMO,
    _VIEW_MEMO,
    load_table,
    register_table_view,
)

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def test_load_table_memo_hit_same_plan(spark):
    a = load_table(spark, SF_A, "nation")
    b = load_table(spark, SF_A, "nation")
    assert a is b  # memo hit: the identical lazy plan object


def test_load_table_distinct_per_sf(spark):
    a = load_table(spark, SF_A, "orders")
    b = load_table(spark, SF_B, "orders")
    assert a is not b
    assert a.count() != b.count()  # different fixtures, both executable


def test_register_view_rebinds_on_sf_change(spark):
    register_table_view(spark, SF_A, "orders")
    n_a = spark.sql("SELECT count(*) FROM orders").first()[0]
    register_table_view(spark, SF_B, "orders")
    n_b = spark.sql("SELECT count(*) FROM orders").first()[0]
    assert n_a == load_table(spark, SF_A, "orders").count()
    assert n_b == load_table(spark, SF_B, "orders").count()
    assert n_a != n_b
    # rebinding to the FIRST fixture again must also take effect
    register_table_view(spark, SF_A, "orders")
    assert spark.sql("SELECT count(*) FROM orders").first()[0] == n_a


def test_register_view_skips_when_unchanged(spark):
    register_table_view(spark, SF_A, "region")
    key = (spark.sparkContext.applicationId, "region")
    bound = _VIEW_MEMO[key]
    register_table_view(spark, SF_A, "region")
    assert _VIEW_MEMO[key] == bound  # no rebind, still the same fixture


def test_memo_invalidates_on_new_file_stat(spark, tmp_path):
    src = os.path.join(SF_A, "nation.parquet")
    work = tmp_path / "sfx"
    work.mkdir()
    dst = work / "nation.parquet"
    dst.write_bytes(open(src, "rb").read())
    a = load_table(spark, str(work), "nation")
    n0 = a.count()
    # regenerate the fixture (same content, new mtime) -> fresh plan
    os.utime(dst, ns=(1, 1))
    b = load_table(spark, str(work), "nation")
    assert a is not b
    assert b.count() == n0
