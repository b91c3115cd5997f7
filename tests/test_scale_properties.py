"""Scale-design properties demonstrated on local Spark: bucketed co-located
joins (no shuffle), partition pruning on the rollup store, salted
repartitioning of hot keys (SCALE.md claims, verified)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ezmsg_sigproc_spark.plans.rollup_tiers import (
    RollupStore,
    run_tiered_rollup,
    salted_repartition,
)
from ezmsg_sigproc_spark.sources.pages import generate_pages


def _plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_needs_no_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the exchange — the
    co-located join SCALE.md prescribes for repeated large-large joins."""
    # a previous session's in-memory catalog is gone but its files remain —
    # clear the managed locations or saveAsTable trips LOCATION_ALREADY_EXISTS
    import shutil

    for tbl in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"/tmp/spark-warehouse/{tbl}", ignore_errors=True)
    a = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_a").join(spark.table("bkt_b"), on="k")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_rollup_store_partition_pruning(spark, tmp_path):
    pages = generate_pages(spark, n_urls=20, samples_per_url=4000)
    store = RollupStore(spark, str(tmp_path / "lake"))
    run_tiered_rollup(spark, pages, store=store)
    buckets = sorted(store.completed_buckets("1m"))
    assert len(buckets) >= 2
    one = store.read_tier("1m").filter(F.col("ts_bucket") == buckets[0])
    plan = _plan(one)
    assert "PartitionFilters" in plan
    assert f"(ts_bucket#" in plan or "ts_bucket =" in plan or "isnotnull(ts_bucket" in plan
    # pruned read touches strictly fewer rows than the full tier
    assert one.count() < store.read_tier("1m").count()


def test_salted_repartition_splits_hot_key(spark):
    # one hot key carrying 90% of rows
    pdf = pd.DataFrame({
        "url": ["hot"] * 9000 + [f"cold{i}" for i in range(1000)],
        "ts": np.arange(10_000, dtype=float),
        "value": np.ones(10_000),
    })
    df = spark.createDataFrame(pdf)
    salted = salted_repartition(df, "url", n_salts=8, n_partitions=16)
    per_part = (
        salted.filter(F.col("url") == "hot")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .toPandas()
    )
    # the hot key's rows land on many partitions, none holding the majority
    assert len(per_part) >= 6
    assert per_part["count"].max() < 9000 * 0.5
