from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_twitter_trends_analytics_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("rtta-tests", cpus=8)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield spark
    spark.stop()


@pytest.fixture(autouse=True)
def _drop_query_caches(request):
    """Same run contract as bench.py / tools/verify_local.py: intra-query
    caches (shingle relations, LSH buckets, co-occurrence edges) belong to
    the query that built them — drop them between tests so a 279-test
    session doesn't accumulate executor storage (VERDICT r4 item 6; the
    storage creep was a plausible contributor to cross-query bench drift).
    Only applies to tests that actually took the session SparkSession."""
    yield
    if "spark" in request.fixturenames:
        request.getfixturevalue("spark").catalog.clearCache()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from realtime_twitter_trends_analytics_spark.sources.loaders import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    yield con
    con.close()
