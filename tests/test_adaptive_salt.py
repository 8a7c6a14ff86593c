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


def test_stage1_bound_and_politeness_invariants_at_extreme_skew(
    spark, skewed_due
):
    """Round-3 verdict next-round #5, measured ON THE OPERATOR'S OWN
    stage-1 intermediate (not a replicated expression) at the
    10^5-due-URLs-one-host scale:

      - every (host, salt) stage-1 group ≤ ceil(backlog/S(host)) plus a
        5·sqrt binomial allowance — the salt is a deterministic URL hash
        (required: leftover correctness needs the same URL → same salt
        every round), so group sizes are binomial around backlog/S, not
        exactly equal; the allowance is ~4σ.
      - the politeness contract holds exactly under the adaptive salts:
        ≤ host_budget scheduled per host, DeltaTime spacing
        sched_unix = round_ts + (seq-1)·delta_time_s, and the hot host's
        batch is the global top-B of its backlog under the pinned order.
    """
    cfg = CrawlConfig(host_budget=4, delta_time_s=2)
    S = 64
    salts = spark.createDataFrame(
        [("hot.test", S)], "host string, salt int"
    )
    sched, leftover, persisted = schedule_round_split(
        skewed_due, cfg, TS, host_salts=salts
    )
    try:
        stage1 = persisted[0]  # the salted+ranked full backlog
        hot_max = (
            stage1.filter(F.col("host") == "hot.test")
            .groupBy("_salt")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        exp = math.ceil(N_HOT / S)
        assert hot_max <= exp + 5 * math.sqrt(exp), (hot_max, exp)
        # no salt group went unused (the backlog really spread over S)
        n_groups = (
            stage1.filter(F.col("host") == "hot.test")
            .select("_salt")
            .distinct()
            .count()
        )
        assert n_groups == S

        rows = sorted(
            (r["depth"], r["url_canon"], r["seq_in_host"], r["sched_unix"])
            for r in sched.filter(F.col("host") == "hot.test").collect()
        )
        assert len(rows) == cfg.host_budget
        # top-B of the backlog under (depth, due, url): depth 0, smallest urls
        assert [r[0] for r in rows] == [0] * 4
        assert [r[3] for r in rows] == [TS, TS + 2, TS + 4, TS + 6]
        per_host_max = (
            sched.groupBy("host").count().agg(F.max("count")).collect()[0][0]
        )
        assert per_host_max <= cfg.host_budget
        # conservation: scheduled + leftover = due (no row lost under salts)
        assert sched.count() + leftover.count() == skewed_due.count()
    finally:
        for df in persisted:
            df.unpersist()


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
