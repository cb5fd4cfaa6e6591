"""Producer-side ingest gate (P1/S2/S3, prod:102/33/71-72)."""

from __future__ import annotations

from pyspark.sql import Row

from realtime_twitter_trends_analytics_spark.functions.text import (
    producer_ingest_filter,
)


def _df(spark):
    return spark.createDataFrame(
        [
            Row(location="Boston, MA", text="game on #Celtics", lang="en"),
            Row(location=None, text="has #tag but no location", lang="en"),
            Row(location="Paris", text="no hashtags here", lang="fr"),
            Row(location="NYC", text="# only-bare-hash", lang="en"),
            Row(location="LA", text="track me #spark", lang="en"),
        ]
    )


def test_location_and_hashtag_gate(spark):
    out = producer_ingest_filter(_df(spark))
    texts = {r["text"] for r in out.collect()}
    assert texts == {"game on #Celtics", "track me #spark"}


def test_language_and_keyword_tracking(spark):
    out = producer_ingest_filter(_df(spark), lang="en", keywords=["spark", "nomatch"])
    assert [r["text"] for r in out.collect()] == ["track me #spark"]
