"""Parameterized SQL (Spark 4 named/positional markers): injection-safe
parameter binding in the SQL front-end — the API a service layer uses
instead of string interpolation."""

from __future__ import annotations

from realtime_twitter_trends_analytics_spark.sources.loaders import load_table


def test_named_parameter_markers(spark, sf_dir):
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_p")
    got = spark.sql(
        "SELECT count(*) AS n FROM nation_p WHERE n_regionkey = :rk",
        args={"rk": 0},
    ).collect()[0]["n"]
    expected = (
        load_table(spark, sf_dir, "nation").filter("n_regionkey = 0").count()
    )
    assert got == expected


def test_positional_parameter_markers(spark, sf_dir):
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_p")
    rows = spark.sql(
        "SELECT r_name FROM region_p WHERE r_regionkey IN (?, ?) ORDER BY r_name",
        args=[0, 1],
    ).collect()
    assert [r["r_name"] for r in rows] == ["AFRICA", "AMERICA"]


def test_parameter_is_value_not_sql(spark, sf_dir):
    """A malicious string binds as a VALUE (matches nothing), never as SQL."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_p")
    got = spark.sql(
        "SELECT count(*) AS n FROM nation_p WHERE n_name = :name",
        args={"name": "x' OR '1'='1"},
    ).collect()[0]["n"]
    assert got == 0
