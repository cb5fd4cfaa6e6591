"""Semantics-faithful unit tests of the reference's bespoke transforms
(FIXTURES.md §B cases; citations in functions/text.py)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from realtime_twitter_trends_analytics_spark.functions.text import (
    clean_hashtag,
    clean_tweet_text,
    country_from_location,
    extract_hashtags,
    parse_sentinel,
)


def _one(spark, col, value: str):
    df = spark.createDataFrame([Row(v=value)])
    return df.select(col(F.col("v")).alias("out")).first()["out"]


def test_parse_sentinel(spark):
    df = spark.createDataFrame([Row(value="Boston, MA /TLOC/ Loving the game #Celtics #NBA")])
    row = df.select(parse_sentinel(F.col("value")).alias("p")).first()["p"]
    assert row["location"] == "Boston, MA"
    assert row["text"] == "Loving the game #Celtics #NBA"


def test_hashtag_extraction_rules(spark):
    # len>1 rule (proc:218) counts the '#': bare '#' (len 1) is dropped,
    # '#x' (len 2) is a valid single-char hashtag, '#ok' kept
    tags = _one(spark, extract_hashtags, "# #x #ok plain #a1 #b2")
    assert tags == ["#x", "#ok", "#a1", "#b2"]


def test_hashtag_extraction_no_hashtags(spark):
    assert _one(spark, extract_hashtags, "nothing to see") == []


def test_hashtag_cleanup_regex(spark):
    # proc:244: "(\\w*RT)|[^a-zA-Z0-9#]" — '\\w*RT' consumes the WHOLE word
    # ending in RT (faithful to the reference), punctuation stripped, # kept
    assert _one(spark, clean_hashtag, "#breaking!") == "#breaking"
    assert _one(spark, clean_hashtag, "#fooRT") == "#"
    assert _one(spark, clean_hashtag, "#RTonly") == "#only"
    assert _one(spark, clean_hashtag, "#a_b-c") == "#abc"


def test_clean_tweet_text_chain(spark):
    out = _one(spark, clean_tweet_text, "RT @user check https://t.co/x #breaking!")
    assert "http" not in out
    assert "@user" not in out
    assert not out.startswith("RT ")
    # proc:225's keep-class has no '#': hash marks are stripped from the
    # sentiment input (hashtags come from the RAW text, proc:217)
    assert "#" not in out
    assert "breaking!" in out


def test_clean_tweet_text_reference_quirks(spark):
    # (\b\w*RT) removes any word ending in RT anywhere, not just a leading
    # retweet marker (proc:225)
    assert _one(spark, clean_tweet_text, "the START of it") == "the  of it"
    # a leading "RT @user" leaves " Foo": step 1 eats "RT", step 3 makes
    # " Foo", and step 4's ^Foo anchor does NOT match past the space
    assert _one(spark, clean_tweet_text, "RT @user hello") == " Foo hello"
    # ^Foo fires when the mention itself starts the tweet
    assert _one(spark, clean_tweet_text, "@user hello") == " hello"
    # URL survives as 'httpst.cox' after the char-class pass, then step 2
    # still removes it (http prefix intact)
    assert _one(spark, clean_tweet_text, "see https://t.co/x now") == "see  now"


def test_country_heuristic(spark):
    cases = {
        "Boston, MA": "USA",          # 2 segments + 2-letter code (proc:205-206)
        "Paris, France": "FRANCE",    # last segment uppercased (proc:202)
        "Gotham": "NULL",             # no comma -> literal 'NULL' (proc:199-200)
        "a, b, Canada": "CANADA",     # >2 segments: last segment, no USA rule
        "x, y!": "Y!",                # raw segment uppercased (proc:209 returns
                                      # the unstripped segment; punctuation is
                                      # only stripped for the length-2 USA test)
        "x, U.S.": "USA",             # punct-stripped 'US' has length 2
    }
    for loc, want in cases.items():
        assert _one(spark, country_from_location, loc) == want, loc


def test_winnowing_guarantees(spark, sf_dir):
    """Winnowing invariants (Schleimer et al.): every window contributes a
    fingerprint, so selected-set density over distinct hash positions is
    at least 1/w and can't exceed the k-gram count; signatures are equal
    iff the selected sets are equal (md5 over the canonical sorted list)."""
    from realtime_twitter_trends_analytics_spark.operators.textstats import (
        WINNOW_W,
        textstats_winnowing,
    )

    rows = textstats_winnowing(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        n_windows = max(r.n_kgrams - WINNOW_W + 1, 0)
        if n_windows == 0:
            assert r.n_selected == 0
            continue
        assert 1 <= r.n_selected <= min(n_windows, r.n_kgrams)
        assert r.fp_min <= r.fp_max
        # sanity on the 60-bit hash range
        assert 0 <= r.fp_min < 2**60


def test_score_sql_fast_spark_bit_identical(spark, sf_dir):
    """score_sql_fast_spark (the streaming hot-path rewrite) must produce
    BIT-identical doubles to the dual-dialect template on real fixtures and
    on the edge shapes (empty, whitespace, single token, exact chunk
    boundary, multi-chunk, out-of-lexicon) — same fold order is the claim,
    exact equality is the check."""
    from realtime_twitter_trends_analytics_spark.functions import dialect as dl
    from realtime_twitter_trends_analytics_spark.functions.sentiment import (
        score_sql,
        score_sql_fast_spark,
    )
    from realtime_twitter_trends_analytics_spark.sources.loaders import load_table

    edge = spark.createDataFrame(
        [
            ("",),
            ("   ",),
            ("fast",),
            ("a b c d e f g h",),                 # exactly one full chunk
            ("a b c d e f g h i",),               # chunk boundary + 1
            ("slow dup small filter fast spark big vector merge nonsense word",),
            ("x  y",),                            # double space -> empty token
        ],
        "text string",
    )
    docs = load_table(spark, sf_dir, "documents").select("text")
    for df in (edge, docs):
        rows = df.select(
            F.expr(score_sql(dl.SPARK, "text")).alias("a"),
            F.expr(score_sql_fast_spark("text")).alias("b"),
        ).collect()
        assert rows
        for r in rows:
            assert r["a"] == r["b"], (r["a"], r["b"])
