"""Tweet-pipeline text transforms as pure column expressions.

Reproduces the reference's bespoke row-level transforms (SURVEY.md §2.2) with
built-in ``pyspark.sql.functions`` — no UDFs, so Catalyst sees through every
step (pushdown, codegen):

- sentinel parse (proc:219, 243): ``"<loc> /TLOC/ <text>"`` -> struct
- tweet-text cleaning chain (proc:224-228)
- hashtag extraction incl. the len>1 rule (proc:217-218, 134-135)
- hashtag cleanup regex (proc:244)
- country heuristic incl. 2-letter->USA and "NULL" default (proc:198-210)

`proc` = /root/reference/src/main/scala/org/streaming/KafkaSparkProcessor.scala.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SENTINEL = " /TLOC/ "


def parse_sentinel(value: Column) -> Column:
    """proc:219/243: split the producer's sentinel-encoded value into a
    struct(location, text). We parse once at ingest and never re-stringify."""
    parts = F.split(value, SENTINEL)
    return F.struct(
        parts.getItem(0).alias("location"),
        parts.getItem(1).alias("text"),
    )


def clean_tweet_text(text: Column) -> Column:
    """proc:224-228 cleaning chain — the reference's exact four replaceAll
    calls in the reference's order:

    1. ``(\\b\\w*RT)|[^a-zA-Z0-9\\s.,!@]`` -> "" — drops any word ending in
       RT (anywhere, not just a leading retweet marker) AND every char
       outside the keep-class. Note the keep-class has NO '#': hashtag
       marks are stripped from the sentiment input (hashtag extraction
       runs on the RAW text, mirroring proc:217's split of the uncleaned
       tweet, so this does not affect trend keys).
    2. ``http\\S+`` -> "" — URL removal AFTER the char-class pass (the
       class already ate ':' and '/', leaving e.g. 'httpst.coxyz', which
       this still matches).
    3. ``@\\w+`` -> "Foo".
    4. ``^Foo`` -> "" — only a Foo at position 0; a mention that became
       " Foo" after step 1 removed a leading RT keeps its space (faithful
       to the reference, which anchors without trimming)."""
    c = F.regexp_replace(text, r"(\b\w*RT)|[^a-zA-Z0-9\s.,!@]", "")
    c = F.regexp_replace(c, r"http\S+", "")
    c = F.regexp_replace(c, r"@\w+", "Foo")
    c = F.regexp_replace(c, r"^Foo", "")
    return c


def clean_hashtag(tag: Column) -> Column:
    """proc:244: ``replaceAll("(\\w*RT)|[^a-zA-Z0-9#]", "")``."""
    return F.regexp_replace(tag, r"(\w*RT)|[^a-zA-Z0-9#]", "")


def extract_hashtags(text: Column) -> Column:
    """proc:217-218: whitespace tokenize, keep '#'-prefixed tokens whose
    whitespace-stripped length > 1. Returns array<string> (explode after)."""
    toks = F.split(text, r"\s+")
    return F.filter(
        toks,
        lambda t: t.startswith("#")
        & (F.length(F.regexp_replace(t, r"\s", "")) > F.lit(1)),
    )


def producer_ingest_filter(df, location: str = "location", text: str = "text",
                           lang: str | None = None, keywords: list[str] | None = None):
    """P1 + S2 + S3 (prod:102, prod:33, prod:71-72): the producer-side gate —
    drop rows with no location or no qualifying hashtag; optional language
    equality and keyword tracking (comma-split keywords OR-matched, like
    twitter4j's FilterQuery.track). All pure predicates: they push down to
    the scan in batch and filter at the source in streaming."""
    out = df.filter(
        F.col(location).isNotNull() & (F.size(extract_hashtags(F.col(text))) > 0)
    )
    if lang is not None:
        out = out.filter(F.col("lang") == lang)
    if keywords:
        pattern = "|".join(keywords)
        out = out.filter(F.col(text).rlike(pattern))
    return out


def to_sentinel(location: Column, text: Column) -> Column:
    """P2 (prod:101-108): producer-side sentinel encoding
    ``"<location> /TLOC/ <text>"`` — provided for wire-compat with existing
    consumers of the reference's Kafka topic. Inside THIS engine data stays
    struct-typed; this exists only at the egress boundary."""
    return F.concat_ws(SENTINEL, location, text)


def country_from_location(location: Column) -> Column:
    """proc:198-210 heuristic, as one when/otherwise chain (no UDF):
    split on ',', take LAST segment; if the location had exactly 2 segments
    and the punctuation-stripped, trimmed segment has length 2 -> 'USA'
    (US state code, proc:205-206); else uppercase(trim(RAW segment)) —
    the reference returns the raw segment, punctuation intact (proc:209);
    literal 'NULL' when the location has no comma (proc:199-200).

    Documented divergence (COVERAGE.md §7.4 table): the reference's
    punctuation-strip regex ``[\\p{Punct}&&[^a-zA-Z]]]`` is malformed — the
    stray ']' makes it match only punctuation-followed-by-']', i.e. a
    near-no-op. We implement the evident INTENT (strip punctuation before
    the length-2 test); the two differ only for last segments whose
    punctuation sits immediately before a ']'."""
    segs = F.split(location, ",")
    nseg = F.size(segs)
    last = F.element_at(segs, -1)
    cleaned = F.trim(F.regexp_replace(last, r"[^a-zA-Z0-9\s]", ""))
    return (
        F.when(nseg < 2, F.lit("NULL"))
        .when((nseg == 2) & (F.length(cleaned) == 2), F.lit("USA"))
        .otherwise(F.upper(F.trim(last)))
    )
