"""W1 adaptive per-host salting (SURVEY §7 hard-part 6; round-2 verdict
next-step #6): a host holding 10^5 due URLs must not funnel them into one
(or eight) stage-1 window partitions — its salt grows with the backlog —
while the scheduled output (fetch order, budgets, DeltaTime spacing) stays
EXACTLY the static-salt result, because stage 2 re-ranks per host over any
salt assignment."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aspseek_spark.config import CrawlConfig
from aspseek_spark.operators.politeness import schedule_round_split

N_HOT = 100_000
TS = 1767225600


@pytest.fixture(scope="module")
def skewed_due(spark):
    hot = spark.range(N_HOT).select(
        F.concat(F.lit("http://hot.test/p"), F.col("id")).alias("url_canon"),
        F.lit("hot.test").alias("host"),
        (F.col("id") % 3).cast("int").alias("depth"),
        F.lit(TS).cast("long").alias("next_fetch_unix"),
    )
    cold = spark.range(200).select(
        F.concat(
            F.lit("http://cold"), (F.col("id") % 4),
            F.lit(".test/p"), F.col("id"),
        ).alias("url_canon"),
        F.concat(F.lit("cold"), (F.col("id") % 4), F.lit(".test")).alias(
            "host"
        ),
        F.lit(0).alias("depth"),
        F.lit(TS).cast("long").alias("next_fetch_unix"),
    )
    return hot.unionByName(cold).localCheckpoint()


def _collect_sched(df):
    return sorted(
        (r["url_canon"], r["seq_in_host"], r["sched_unix"])
        for r in df.collect()
    )


def test_adaptive_salt_preserves_fetch_order(spark, skewed_due):
    cfg = CrawlConfig(host_budget=4, delta_time_s=2)
    salts = spark.createDataFrame(
        [("hot.test", 64)], "host string, salt int"
    )
    s_static, lo_static, p1 = schedule_round_split(skewed_due, cfg, TS)
    s_adapt, lo_adapt, p2 = schedule_round_split(
        skewed_due, cfg, TS, host_salts=salts
    )
    try:
        assert _collect_sched(s_static) == _collect_sched(s_adapt)
        lo_a = {r["url_canon"] for r in lo_static.select("url_canon").collect()}
        lo_b = {r["url_canon"] for r in lo_adapt.select("url_canon").collect()}
        assert lo_a == lo_b
    finally:
        for df in p1 + p2:
            df.unpersist()


def test_adaptive_salt_bounds_stage1_groups(spark, skewed_due):
    """The point of the override: stage-1 group sizes drop from backlog/8
    (12.5k rows with the static default) to ~backlog/S(host)."""
    salt = 64
    salts = spark.createDataFrame(
        [("hot.test", salt)], "host string, salt int"
    )
    # replicate the operator's stage-1 salt expression exactly
    adaptive_groups = (
        skewed_due.join(F.broadcast(salts), "host", "left")
        .withColumn(
            "_salt",
            F.pmod(F.hash("url_canon"), F.coalesce(F.col("salt"), F.lit(8))),
        )
        .groupBy("host", "_salt")
        .count()
    )
    max_adaptive = adaptive_groups.agg(F.max("count")).collect()[0][0]
    static_groups = (
        skewed_due.withColumn("_salt", F.pmod(F.hash("url_canon"), F.lit(8)))
        .groupBy("host", "_salt")
        .count()
    )
    max_static = static_groups.agg(F.max("count")).collect()[0][0]
    expect = math.ceil(N_HOT / salt)
    assert max_adaptive < expect * 1.5, (max_adaptive, expect)
    assert max_static > N_HOT / 8 * 0.7  # the skew the override removes
    assert max_adaptive * 4 < max_static


def test_loop_derives_hot_host_salts(spark, tmp_path):
    """CrawlJob._write_host_salts: a host with backlog > 8·target gets
    S = ceil(backlog/target); normal hosts are not carried."""
    from aspseek_spark.plans.crawl_loop import CrawlJob
    from aspseek_spark.sources.tables import StateStore

    cfg = CrawlConfig(salt_group_target=1000)
    store = StateStore(str(tmp_path / "state"), spark)
    job = CrawlJob(spark, store, cfg, None, None)
    leftover = spark.range(20_000).select(
        F.lit("hot.test").alias("host"), F.col("id")
    ).unionByName(
        spark.range(50).select(F.lit("cold.test").alias("host"), F.col("id"))
    )
    job._write_host_salts(7, leftover)
    got = {
        (r["host"], r["salt"])
        for r in job._read_host_salts(7).collect()
    }
    assert got == {("hot.test", 20)}
