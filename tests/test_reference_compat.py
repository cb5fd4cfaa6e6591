"""Wire-compat with the reference: producer sentinel encoding (P2,
prod:108) round-trips through the consumer parse (P7, proc:219), and the
output projection matches the reference's declared schema (proc:97-102,
FIXTURES.md B2) byte-for-byte in names and types."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from realtime_twitter_trends_analytics_spark.functions.text import (
    parse_sentinel,
    to_sentinel,
)
from realtime_twitter_trends_analytics_spark.streaming.pipeline import (
    to_reference_schema,
    transform_tweets,
)


def test_sentinel_round_trip(spark):
    df = spark.createDataFrame(
        [Row(location="Boston, MA", text="Loving the game #Celtics")]
    )
    out = (
        df.select(to_sentinel(F.col("location"), F.col("text")).alias("value"))
        .select(parse_sentinel(F.col("value")).alias("p"))
        .select("p.location", "p.text")
        .first()
    )
    assert out["location"] == "Boston, MA"
    assert out["text"] == "Loving the game #Celtics"


def test_reference_output_schema(spark):
    raw = spark.createDataFrame(
        [Row(key="1700000000", value="Boston, MA /TLOC/ fast game #Celtics")]
    )
    scored = transform_tweets(
        raw, ts_col=F.timestamp_seconds(F.col("key").cast("long"))
    )
    ref = to_reference_schema(scored)
    # FIXTURES.md B2: exact names (hyphens included) and types
    assert ref.columns == [
        "timestamp", "hashtag", "sentiment-score", "sentiment-type", "country",
    ]
    dtypes = dict(ref.dtypes)
    assert dtypes["timestamp"] == "int"          # epoch seconds (proc:109)
    assert dtypes["sentiment-score"] == "double"
    assert dtypes["sentiment-type"] == "string"
    row = ref.first()
    assert row["timestamp"] == 1_700_000_000
    assert row["hashtag"] == "#Celtics"
    assert row["country"] == "USA"
    assert row["sentiment-type"] in {
        "notunderstood", "verynegative", "negative", "neutral", "positive", "verypositive",
    }
