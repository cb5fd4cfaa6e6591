"""docs_dsir_weights: the hashed-ngram log-likelihood-ratio weights must
equal an independent pure-Python DSIR recomputation (hashlib md5, Counter
distributions) on a planted corpus, and target-vocabulary docs must outrank
off-target docs — the property DSIR selection exists to deliver.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from realtime_twitter_trends_analytics_spark.operators.cleaning import (
    DSIR_BUCKETS,
    DSIR_HEX_CHARS,
    DSIR_TARGET_LANG,
    docs_dsir_weights,
)

# Planted corpus: 'en' docs use TARGET_WORDS; 'de' docs use OFF_WORDS; one
# mixed doc sits in between. The en slice IS the target, so target-vocab
# docs must come out with higher log-weights than off-vocab docs.
TARGET_WORDS = ["alpha", "beta", "gamma", "delta"]
OFF_WORDS = ["zork", "quux", "blarg", "fnord"]


def _mk_docs():
    rows = []
    doc_id = 0
    for i in range(6):
        t = " ".join(TARGET_WORDS[i % 4 :] + TARGET_WORDS[: i % 4]) * 2
        rows.append((doc_id, t.strip(), "en", f"s{i % 2}", len(t)))
        doc_id += 1
    for i in range(6):
        t = " ".join(OFF_WORDS[i % 4 :] + OFF_WORDS[: i % 4]) * 2
        rows.append((doc_id, t.strip(), "de", f"s{i % 2}", len(t)))
        doc_id += 1
    mixed = " ".join(TARGET_WORDS[:2] + OFF_WORDS[:2])
    rows.append((doc_id, mixed, "fr", "s0", len(mixed)))
    return rows


def _bucket(feature: str) -> int:
    h = hashlib.md5(feature.encode()).hexdigest()[:DSIR_HEX_CHARS]
    return int(h, 16) % DSIR_BUCKETS


def _features(text: str) -> list[int]:
    toks = text.split(" ")
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_bucket(f) for f in feats]


def _reference_weights(rows):
    raw, tgt = Counter(), Counter()
    per_doc: dict[int, list[int]] = {}
    for doc_id, text, lang, _s, _n in rows:
        bs = _features(text)
        per_doc[doc_id] = bs
        raw.update(bs)
        if lang == DSIR_TARGET_LANG:
            tgt.update(bs)
    tot_r = sum(raw.values()) + DSIR_BUCKETS
    tot_t = sum(tgt.values()) + DSIR_BUCKETS
    out = {}
    for doc_id, bs in per_doc.items():
        w = sum(
            math.log((tgt[b] + 1) / tot_t) - math.log((raw[b] + 1) / tot_r)
            for b in bs
        )
        out[doc_id] = (len(bs), round(w, 4))
    return out


@pytest.fixture(scope="module")
def dsir_dir(tmp_path_factory):
    from realtime_twitter_trends_analytics_spark.session import get_spark

    spark = get_spark("rtta-tests", cpus=8)
    out = tmp_path_factory.mktemp("dsir_sf")
    df = spark.createDataFrame(
        _mk_docs(),
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out)


def test_weights_match_pure_python_dsir(spark, dsir_dir):
    got = {
        r["doc_id"]: (r["n_features"], r["dsir_logw"])
        for r in docs_dsir_weights(spark, dsir_dir).collect()
    }
    want = _reference_weights(_mk_docs())
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id][0] == want[doc_id][0]
        assert got[doc_id][1] == pytest.approx(want[doc_id][1], abs=2e-4)


def test_target_vocab_outranks_off_vocab(spark, dsir_dir):
    rows = {r["doc_id"]: r["dsir_logw"] for r in docs_dsir_weights(spark, dsir_dir).collect()}
    en_min = min(w for d, w in rows.items() if d < 6)
    de_max = max(w for d, w in rows.items() if 6 <= d < 12)
    mixed = rows[12]
    assert en_min > mixed > de_max
