"""Bucketed co-located join: pre-bucketing both fact tables on the join key
removes the shuffle entirely — THE join strategy for repeated fact-fact
joins at 100 TB (SURVEY §4.3 / 'Partitioning & shuffle')."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.plans.explain import count_exchanges, explain_str
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table


@pytest.fixture()
def bucket_tables(spark):
    # managed tables land in the session's default warehouse (gitignored);
    # DROP TABLE removes the files afterwards.
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucket_tables):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b"))

    ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy("o_orderstatus").count()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        plan = explain_str(joined)
        n_bucketed = count_exchanges(joined)
        unbucketed = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus").count()
        )
        n_plain = count_exchanges(unbucketed)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    # bucket co-location: the join shuffles NEITHER side — only the final
    # tiny aggregation exchanges (1), vs 3 for the unbucketed plan.
    assert "SortMergeJoin" in plan
    assert n_bucketed == 1
    assert n_plain == 3

    # sanity: same result as the unbucketed join
    expected = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus").count()
    )
    got = {r["o_orderstatus"]: r["count"] for r in joined.collect()}
    want = {r["o_orderstatus"]: r["count"] for r in expected.collect()}
    assert got == want
