"""Dead PQ codewords (ADVICE r12, medium): a cluster that empties during
training must be EXCLUDED from the literal encode candidates — the exact
semantics of the batch _pq_assign equi-join, where a missing (block, code)
row never joins. The pre-r13 design pinned dead codewords "infinitely far"
with a 1<<40 sentinel COORDINATE, but the distance expression squares
coordinates: (x - 2^40)^2 ~ 2^80 overflows BIGINT — under Spark 4's default
ANSI mode (this repo does not disable ANSI) every encode/LUT evaluation
would THROW the moment any cluster emptied, and with ANSI off the wrapped
negative d2 would make the dead code WIN the argmin (silent corruption).

Pinned here, against a codebook with deliberately dead codes (the shape a
retrain over arbitrary accumulated stream vectors can produce):
- pq_codes_sql evaluates WITHOUT overflow under default ANSI and returns
  the brute-force argmin over LIVE codes only;
- pq_lut_sql's dead slots hold the stored constant DEAD_CODE_D2 (never
  entered into arithmetic) and its live slots match brute force;
- the served ADC over such a codebook stays finite (8 x DEAD_CODE_D2 is
  the worst UNREACHABLE sum, far inside BIGINT).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.operators.ml import (
    DEAD_CODE_D2,
    PQ_BLOCKS,
    PQ_K,
    PQ_SUB_DIM,
    pq_codes_sql,
    pq_lut_sql,
)

# live codes per block: block 2 loses code 7; block 5 keeps only 3 codes
_DEAD = {2: {7}, 5: set(range(PQ_K)) - {0, 4, 9}}


def _codebook():
    rows = []
    for b in range(PQ_BLOCKS):
        for c in range(PQ_K):
            if c in _DEAD.get(b, set()):
                continue
            rows.append(
                (b, c, [((b * 37 + c * 11 + d * 5) % 41) - 20 for d in range(PQ_SUB_DIM)])
            )
    return rows


def _vecs(n=12):
    return [
        (i, [((i * 13 + d * 7) % 61) - 30 for d in range(PQ_BLOCKS * PQ_SUB_DIM)])
        for i in range(n)
    ]


def _brute_codes(cb_rows, qe):
    by_block = {}
    for b, c, vec in cb_rows:
        by_block.setdefault(b, {})[c] = vec
    out = []
    for b in range(PQ_BLOCKS):
        sub = qe[b * PQ_SUB_DIM:(b + 1) * PQ_SUB_DIM]
        d2c = sorted(
            (sum((x - y) * (x - y) for x, y in zip(sub, vec)), c)
            for c, vec in by_block[b].items()
        )
        out.append(d2c[0][1])
    return out


def test_encode_excludes_dead_codes_no_overflow(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"  # default ANSI on
    cb = _codebook()
    df = spark.createDataFrame(_vecs(), "vec_id long, qe array<bigint>")
    got = {
        r["vec_id"]: list(r["codes"])
        for r in df.select(
            "vec_id", F.expr(pq_codes_sql(cb)).alias("codes")
        ).collect()
    }
    for i, qe in _vecs():
        want = _brute_codes(cb, qe)
        assert got[i] == want, f"vec {i}"
        assert 7 != got[i][2] or 7 not in _DEAD[2]  # dead code never emitted
        assert got[i][5] in {0, 4, 9}


def test_lut_dead_slots_hold_constant_live_slots_exact(spark):
    cb = _codebook()
    by_block = {}
    for b, c, vec in cb:
        by_block.setdefault(b, {})[c] = vec
    df = spark.createDataFrame(_vecs(3), "vec_id long, qe array<bigint>")
    luts = {
        r["vec_id"]: [list(bl) for bl in r["lut"]]
        for r in df.select("vec_id", F.expr(pq_lut_sql(cb)).alias("lut")).collect()
    }
    for i, qe in _vecs(3):
        lut = luts[i]
        assert len(lut) == PQ_BLOCKS and all(len(bl) == PQ_K for bl in lut)
        for b in range(PQ_BLOCKS):
            sub = qe[b * PQ_SUB_DIM:(b + 1) * PQ_SUB_DIM]
            for c in range(PQ_K):
                if c in _DEAD.get(b, set()):
                    assert lut[b][c] == DEAD_CODE_D2
                else:
                    want = sum(
                        (x - y) * (x - y) for x, y in zip(sub, by_block[b][c])
                    )
                    assert lut[b][c] == want
    # worst unreachable ADC sum stays far inside BIGINT
    assert PQ_BLOCKS * DEAD_CODE_D2 < (1 << 62)
