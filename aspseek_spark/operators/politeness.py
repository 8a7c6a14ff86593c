"""Per-host politeness priority queue (SURVEY.md §2.5 W1/W2, north_star).

The reference serializes fetches per server with in-memory queues + mutexes
and spaces them by DeltaTime ([R:src/index.cpp], BASELINE.json:6). Spark has
no mutable queues, so the same *semantics* are re-expressed declaratively:

  priority order  = (depth ASC, next_fetch_unix ASC, url_canon ASC)
                    — fully deterministic; url_canon is the total tie-break
                    so engine and oracle produce identical sequences (§7
                    hard-part 1).
  per-host budget = keep rank ≤ host_budget within each host.
  DeltaTime       = sched_unix = round_ts + (rank-1) * delta_time_s —
                    reproduces the reference's intra-host spacing exactly.

Skew (§7 hard-part 6): a hot host would funnel all its due URLs into one
window partition. Because host_budget B is small, top-B-per-host is computed
in two stages with identical semantics:

  stage 1: rank within (host, salt) where salt = pmod(murmur3(url), S) and
           keep rank ≤ B  → at most S·B survivors per host, any skew is
           capped at the salt granularity;
  stage 2: re-rank the ≤ S·B survivors per host with the same ordering and
           keep rank ≤ B.

Budget and DeltaTime are enforced per host (not per host+salt) in stage 2,
preserving spacing semantics. AQE skew-join handling stays enabled for the
joins around this operator (session config).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig

def _order() -> list:
    """The pinned deterministic priority order (depth, due time, url)."""
    return [
        F.col("depth").asc(),
        F.col("next_fetch_unix").asc(),
        F.col("url_canon").asc(),
    ]


def schedule_round(
    due: DataFrame, config: CrawlConfig, round_ts: int, salt_factor: int = 8
) -> DataFrame:
    """Due frontier rows → scheduled rows with seq_in_host + sched_unix.

    Input must have: url_canon, host, depth, next_fetch_unix.
    """
    b = config.host_budget

    if config.max_urls_per_round is not None:
        # global round cap (W2): distributed TakeOrdered, not a 1-partition
        # window — Spark plans sort+limit as TakeOrderedAndProject.
        due = due.sort(*_order()).limit(config.max_urls_per_round)

    # stage 1: salted local top-B (caps skew without changing semantics)
    salted = due.withColumn(
        "_salt", F.pmod(F.hash("url_canon"), F.lit(salt_factor))
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*_order())
    local_top = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= b)
        .drop("_salt", "_rn1")
    )

    # stage 2: exact per-host rank over ≤ S·B rows/host
    w2 = Window.partitionBy("host").orderBy(*_order())
    return (
        local_top.withColumn("seq_in_host", F.row_number().over(w2))
        .filter(F.col("seq_in_host") <= b)
        .withColumn(
            "sched_unix",
            F.lit(round_ts)
            + (F.col("seq_in_host") - F.lit(1)) * F.lit(config.delta_time_s),
        )
    )
