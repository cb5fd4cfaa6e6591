"""Physical-plan quality gates (SURVEY §4): pushdown, broadcast, top-k
planning, shuffle budget. These fail if a refactor silently degrades the
100 TB story even while correctness stays green."""

from __future__ import annotations

from realtime_twitter_trends_analytics_spark.operators.relational import (
    q01_pricing_summary,
    q05_region_revenue,
    q06_forecast_revenue,
    sort_global_topk,
)
from realtime_twitter_trends_analytics_spark.operators.trends import (
    trends_token_topk,
    tweet_pipeline_flagship,
)
from realtime_twitter_trends_analytics_spark.plans.explain import (
    count_exchanges,
    explain_str,
    has_node,
    has_pushed_filters,
)


def test_q06_filters_reach_parquet_scan(spark, sf_dir):
    df = q06_forecast_revenue(spark, sf_dir)
    assert has_pushed_filters(df, "l_shipdate")
    assert has_pushed_filters(df, "l_discount")
    assert has_pushed_filters(df, "l_quantity")


def test_q01_column_pruning(spark, sf_dir):
    plan = explain_str(q01_pricing_summary(spark, sf_dir))
    # scan must NOT read the unused fact columns
    assert "l_partkey" not in plan
    assert "l_suppkey" not in plan
    assert has_pushed_filters(q01_pricing_summary(spark, sf_dir), "l_shipdate")


def test_q05_broadcasts_dimensions(spark, sf_dir):
    plan = explain_str(q05_region_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastExchange" in plan


def test_global_topk_avoids_full_sort(spark, sf_dir):
    assert has_node(sort_global_topk(spark, sf_dir), "TakeOrderedAndProject")


def test_whole_stage_codegen_covers_scan_agg(spark, sf_dir):
    # AQE hides codegen subtrees pre-execution; disable it for inspection
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = explain_str(q01_pricing_summary(spark, sf_dir), "codegen")
        n = int(plan.split("Found ")[1].split(" WholeStageCodegen")[0])
        assert n >= 2  # scan+partial-agg subtree and final-agg subtree
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_shuffle_budget_trends_topk(spark, sf_dir):
    # explode (map-side) -> agg shuffle -> window shuffle: exactly 2
    assert count_exchanges(trends_token_topk(spark, sf_dir)) <= 2


def test_shuffle_budget_flagship(spark, sf_dir):
    # sentiment+explode map-side; one agg shuffle + one window shuffle
    assert count_exchanges(tweet_pipeline_flagship(spark, sf_dir)) <= 2


def test_q01_shuffle_budget(spark, sf_dir):
    # partial/final hash agg: a single exchange
    assert count_exchanges(q01_pricing_summary(spark, sf_dir)) <= 1


def test_tfidf_broadcasts_df_table(spark, sf_dir):
    """The vocabulary-sized df table must broadcast (Zipf: vocab << corpus);
    a shuffled join here would reshuffle the whole tf relation."""
    from realtime_twitter_trends_analytics_spark.operators.textstats import (
        textstats_tfidf,
    )

    plan = explain_str(textstats_tfidf(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_ngram_jaccard_hot_list_broadcasts_and_join_is_hashed(spark, sf_dir):
    """The hot-shingle anti-join must be broadcast (map-side filter, no
    extra shuffle of the shingle relation) and the self-join must be
    shuffle-hash, not sort-merge (output feeds a hash agg). The anti-join
    lives in the shared staging relation's build plan (it is materialized
    once per application — capped_shingle_staging), so assert it on the
    lazy plan form; the pair self-join is in the query's own plan."""
    from realtime_twitter_trends_analytics_spark.operators.dedup import (
        capped_shingle_plan,
        dedup_ngram_jaccard,
    )

    staging_plan = explain_str(capped_shingle_plan(spark, sf_dir))
    assert "BroadcastHashJoin" in staging_plan and "LeftAnti" in staging_plan
    plan = explain_str(dedup_ngram_jaccard(spark, sf_dir))
    assert "ShuffledHashJoin" in plan
    spark.catalog.clearCache()


def test_decontaminate_single_equijoin_no_flag_join(spark, sf_dir):
    """The split flag must be a projection expression, not a join against
    a per-doc flags table (corpus-sized 'small' side = broadcast OOM at
    scale): exactly ONE join in the plan — the shingle-key equi-join probe
    (train side distinct -> linear, no cartesian)."""
    import re

    from realtime_twitter_trends_analytics_spark.operators.dedup import (
        decontaminate_ngram_overlap,
    )

    plan = explain_str(decontaminate_ngram_overlap(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n_joins = len(re.findall(r"\(\d+\) \w*(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan))
    assert n_joins == 1, plan


def test_v4_decontamination_join_is_broadcast(spark, sf_dir):
    """corpus_pipeline_v4's decontamination probe must BROADCAST the
    distinct eval-shingle relation (it is small by construction — one
    split bucket distinct-reduced; round 13, VERDICT r12 item 4: hinted,
    not left to AQE). The join lives in the checkpointed staging build
    plan, so assert it on the audited plan (v4_flagged_staging)."""
    from realtime_twitter_trends_analytics_spark.audit import audit_plans
    from realtime_twitter_trends_analytics_spark.operators.cleaning import (
        corpus_pipeline_v4,
    )

    corpus_pipeline_v4(spark, sf_dir)
    plan = audit_plans()["v4_flagged_staging"]
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftOuter" in plan
    spark.catalog.clearCache()


def test_fuzzy_blocked_is_equijoin_not_cartesian(spark, sf_dir):
    """Blocking must plan as an equi-join on (blk, lb) with levenshtein as
    a post-join filter — a nested-loop join here means the blocking key
    was lost and every title pairs with every title."""
    from realtime_twitter_trends_analytics_spark.operators.dedup import (
        dedup_fuzzy_blocked,
    )

    plan = explain_str(dedup_fuzzy_blocked(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_repetition_has_no_shuffle(spark, sf_dir):
    """Repetition signals are per-row array math — any Exchange in this
    plan is a regression (the operator must scale as one scan)."""
    from realtime_twitter_trends_analytics_spark.operators.textstats import (
        textstats_repetition,
    )
    from realtime_twitter_trends_analytics_spark.plans.explain import count_exchanges

    assert count_exchanges(textstats_repetition(spark, sf_dir)) == 0


def test_window_distribution_single_shuffle(spark, sf_dir):
    """All five window functions share one partition spec -> exactly one
    exchange on the partition key."""
    from realtime_twitter_trends_analytics_spark.operators.relational_ext import (
        window_distribution_funcs,
    )
    from realtime_twitter_trends_analytics_spark.plans.explain import count_exchanges

    assert count_exchanges(window_distribution_funcs(spark, sf_dir)) == 1


def test_embedding_cosine_has_no_cartesian(spark, sf_dir):
    """Candidates come from bucket equi-joins — a CartesianProduct or
    BroadcastNestedLoopJoin in this plan means the LSH bound was lost."""
    from realtime_twitter_trends_analytics_spark.operators.similarity import (
        dedup_embedding_cosine,
    )

    plan = explain_str(dedup_embedding_cosine(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    spark.catalog.clearCache()


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime bloom-filter join pruning — the 100 TB mechanism for a
    selective dim filter cutting the fact-side shuffle: Spark injects a
    bloom_filter_agg on the filtered build side and a might_contain guard
    on the probe side's scan. Gated here so the conf recipe (documented in
    cluster_conf) keeps working; thresholds are floored because the local
    test tables are tiny."""
    from pyspark.sql import functions as F

    from realtime_twitter_trends_analytics_spark.sources.loaders import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_weighted_priority_sample_is_takeordered(spark, sf_dir):
    """The global K-smallest must plan as per-partition heaps + driver
    merge — a full sort would shuffle the corpus at 100 TB."""
    from realtime_twitter_trends_analytics_spark.operators.sampling import (
        sample_weighted_priority,
    )

    assert has_node(sample_weighted_priority(spark, sf_dir), "TakeOrderedAndProject")


def test_bpe_merges_is_takeordered_over_vocab(spark, sf_dir):
    from realtime_twitter_trends_analytics_spark.operators.textstats import (
        textstats_bpe_merges,
    )

    assert has_node(textstats_bpe_merges(spark, sf_dir), "TakeOrderedAndProject")


def test_winnowing_has_no_keyed_shuffle(spark, sf_dir):
    """Winnowing is a pure per-row array pipeline — a KEYED exchange in
    the plan means someone introduced a join/agg into the map-only pass.
    The one allowed exchange is the r14 fan_out_small parallelism floor
    (RoundRobinPartitioning over the single-row-group local fixture),
    which is identity at scale and never re-keys data."""
    from realtime_twitter_trends_analytics_spark.operators.textstats import (
        textstats_winnowing,
    )

    plan = textstats_winnowing(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    import re

    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(kind == "RoundRobinPartitioning" for kind in exchanges), exchanges
    assert len(exchanges) <= 1, exchanges


def test_text_normalize_has_no_shuffle(spark, sf_dir):
    from realtime_twitter_trends_analytics_spark.operators.cleaning import (
        docs_text_normalize,
    )

    assert count_exchanges(docs_text_normalize(spark, sf_dir)) == 0


def test_attribution_single_shuffle(spark, sf_dir):
    """One user_id exchange for the window; a second exchange would mean a
    purchases x clicks self-join crept back in."""
    from realtime_twitter_trends_analytics_spark.operators.relational_ext import (
        events_attribution,
    )

    assert count_exchanges(events_attribution(spark, sf_dir)) <= 1


def test_pq_adc_lut_joins_are_broadcast(spark, sf_dir):
    """ADC candidates must join the per-query LUT via broadcast hash —
    a sort-merge here would shuffle the code table on a 640-row side."""
    from realtime_twitter_trends_analytics_spark.operators.similarity import (
        sim_pq_adc_ann,
    )

    plan = explain_str(sim_pq_adc_ann(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_normal_equations_single_agg_shuffle(spark, sf_dir):
    """X'X accumulation is one (i, j)-keyed agg over a map-side pair
    expansion: exactly one exchange (plus AQE reads)."""
    from realtime_twitter_trends_analytics_spark.operators.ml import (
        ml_normal_equations,
    )

    assert count_exchanges(ml_normal_equations(spark, sf_dir)) <= 2
