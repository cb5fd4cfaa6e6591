"""Schema-dtype parity gate: every oracle query's DuckDB result types must
map 1:1 onto the Spark DataFrame's types (the driver compares schemas, not
just values — a BIGINT row_number vs Spark's int would fail even with
identical values)."""

from __future__ import annotations

from realtime_twitter_trends_analytics_spark.registry import all_oracles, all_queries

SPARK_TO_DUCK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "double": {"DOUBLE"},
    "string": {"VARCHAR"},
    "timestamp": {"TIMESTAMP"},
    "timestamp_ntz": {"TIMESTAMP"},
    "date": {"DATE"},
    "boolean": {"BOOLEAN"},
}


def test_every_oracle_matches_spark_dtypes(spark, duck, sf_dir):
    q, o = all_queries(), all_oracles()
    problems = []
    for name in sorted(o):
        stypes = dict(q[name](spark, sf_dir).dtypes)
        dtypes = {
            r[0]: r[1] for r in duck.execute(f"DESCRIBE ({o[name]})").fetchall()
        }
        if set(stypes) != set(dtypes):
            problems.append(f"{name}: columns {sorted(stypes)} vs {sorted(dtypes)}")
            continue
        for col, st in stypes.items():
            if dtypes[col] not in SPARK_TO_DUCK.get(st, set()):
                problems.append(f"{name}.{col}: spark={st} duck={dtypes[col]}")
    assert problems == []
