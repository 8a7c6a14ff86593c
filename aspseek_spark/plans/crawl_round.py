"""One crawl round as a micro-batch DataFrame pipeline (SURVEY.md §3.1).

Reference control flow (one pass of index's thread pool over due URLs,
[R:src/index.cpp]) re-expressed as the declarative plan of SURVEY.md §3.1:

  frontier scan → robots ensure/filter → politeness schedule → simulated
  fetch join → parse (Arrow UDF) → outlink candidates → URL-seen test →
  state updates

Every nondeterminism source is pinned (§7 hard-part 1): ordering keys always
(depth, next_fetch_unix, url_canon); in-round candidate dedup keeps
min(struct(depth, origin)); round timestamps are pure functions of round_id.
The oracle crawler (oracle/model_crawler.py) implements the exact same
rules, and tests assert identical fetch order + seen set.

Scale notes: the ``html`` column is dropped immediately after parse so page
bytes never shuffle; the fetch join shuffles on url_canon (at 10^10 scale:
bucket ``pages`` by url so the join co-locates); AQE skew-join covers hot
hosts on the robots join; the seen test's shuffle is bounded by the bloom
partition count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..operators.canonicalize import with_canonical
from ..operators.parse import parse_fetched, with_content_digests
from ..operators.politeness import schedule_round
from ..operators.robots_join import fetch_missing_robots, robots_allow_filter
from ..operators.seen import bloom_add, seen_filter_new


@dataclass
class RoundResult:
    frontier: DataFrame
    seen_delta: DataFrame
    bloom: DataFrame
    robots_delta: DataFrame
    fetched: DataFrame
    round_ts: int
    # persisted intermediates to unpersist after the snapshot commit, plus
    # their cheap counts for the metrics table (no extra actions)
    persisted: list = None
    scheduled: DataFrame = None
    new_urls: DataFrame = None
    links: DataFrame = None  # crawl link graph delta (D5/J6)


def init_state(
    spark: SparkSession, seeds: DataFrame, config: CrawlConfig
) -> RoundResult:
    """Round-0 state: seeds → frontier + seen + bloom (SRC5 seed insertion)."""
    from ..operators.seen import BLOOM_STATE_SCHEMA  # noqa: F401
    from ..sources.tables import BLOOM_SCHEMA

    seeded = (
        with_canonical(seeds, "url")
        .select("url_canon", "url_hash64", "hash32", "host")
        .dropDuplicates(["url_canon"])
        .withColumn("depth", F.lit(0))
        .withColumn("next_fetch_unix", F.lit(config.round_ts_unix(0)).cast("long"))
        .withColumn("round_added", F.lit(0))
        .withColumn("origin_hash64", F.lit(None).cast("long"))
        .withColumn("tag", F.lit(config.tag))
        .select(
            "url_canon", "url_hash64", "hash32", "host", "depth",
            "next_fetch_unix", "round_added", "origin_hash64", "tag",
        )
    )
    empty_bloom_state = spark.createDataFrame([], BLOOM_SCHEMA)
    bloom = bloom_add(seeded, empty_bloom_state, config)
    seen_delta = seeded.select("url_canon", "url_hash64", "hash32", "round_added")
    from ..operators.robots_join import empty_robots

    return RoundResult(
        frontier=seeded,
        seen_delta=seen_delta,
        bloom=bloom,
        robots_delta=empty_robots(spark),
        fetched=None,
        round_ts=config.round_ts_unix(0),
    )


def run_round(
    spark: SparkSession,
    round_id: int,
    config: CrawlConfig,
    frontier: DataFrame,
    seen: DataFrame,
    bloom: DataFrame,
    robots: DataFrame,
    pages: DataFrame,
    robots_src: DataFrame,
) -> RoundResult:
    round_ts = config.round_ts_unix(round_id)

    # ---- SRC1 frontier scan: due vs not-due (predicates push to parquet).
    # F9 tag-subset (index -t): when tag_filter is set, only that tag's rows
    # are even candidates; other tags stay in the frontier untouched.
    due = frontier.filter(F.col("next_fetch_unix") <= F.lit(round_ts))
    not_due = frontier.filter(F.col("next_fetch_unix") > F.lit(round_ts))
    if config.tag_filter is not None:
        not_due = not_due.unionByName(
            due.filter(F.col("tag") != F.lit(config.tag_filter))
        )
        due = due.filter(F.col("tag") == F.lit(config.tag_filter))

    # ---- SRC3/J2/F4 robots: fetch missing hosts' robots, then filter
    robots_delta = fetch_missing_robots(
        due.select("host"), robots, robots_src, config.user_agent, round_ts
    ).persist()  # consumed by this round's filter AND the snapshot write
    robots_all = robots.unionByName(robots_delta)
    flagged = robots_allow_filter(due, robots_all)
    # persisted: consumed by the politeness schedule AND the leftover
    # anti-join (frontier rewrite) — avoids re-running the robots UDF join
    allowed = flagged.filter(F.col("robots_ok")).drop("robots_ok").persist()
    # robots-denied rows leave the frontier permanently (never fetched);
    # they remain in `seen`, so they are never re-discovered either.

    # ---- W1/W2 politeness schedule
    # persisted: consumed by the fetch join, leftover anti-join, and revisit
    scheduled = schedule_round(allowed, config, round_ts).persist()
    # due-but-over-budget rows stay in the frontier untouched for next round;
    # the scheduled batch is bounded (hosts × budget) → broadcast anti-join
    leftover = allowed.join(
        F.broadcast(scheduled.select("url_canon")), on="url_canon", how="left_anti"
    )

    # ---- J3 fetch (simulated: equi-join against the pages corpus — the
    # seam where a live mapInPandas HTTP connector would plug in).
    # The corpus is the 100 TB side: broadcast the (bounded) scheduled batch
    # INTO it so `pages` is scanned once and never shuffled; misses (=404)
    # come from a second broadcast anti-join instead of an outer join, which
    # would have forced a shuffle of the big side.
    pages_slim = pages.select(F.col("url").alias("url_canon"), "html")
    # persisted: the single pages scan feeds both the hit rows and the
    # miss-detection anti-join below
    found = pages_slim.join(
        F.broadcast(scheduled), on="url_canon", how="inner"
    ).persist()
    misses = scheduled.join(
        F.broadcast(found.select("url_canon")), on="url_canon", how="left_anti"
    ).withColumn("html", F.lit(None).cast("binary"))
    raw = found.unionByName(misses).withColumn(
        "status",
        F.when(F.col("html").isNotNull(), F.lit(200)).otherwise(F.lit(404)),
    )
    raw = with_content_digests(raw)

    # ---- §2.9 parse: byte-exact text + outlinks (Arrow batch, html dropped)
    parsed = parse_fetched(raw, config).drop("html")
    parsed = parsed.persist()  # consumed twice: fetched output + candidates

    fetched = parsed.select(
        F.lit(round_id).alias("round"),
        "url_canon",
        "url_hash64",
        "host",
        "depth",
        "seq_in_host",
        F.col("sched_unix").cast("long").alias("sched_unix"),
        # F7 status branches: 404 miss / 302 meta-refresh redirect / 200
        F.when(F.col("status") == 404, F.lit(404))
        .when(F.col("redirect_canon").isNotNull(), F.lit(302))
        .otherwise(F.lit(200))
        .alias("status"),
        "content_crc",
        "content_md5",
        F.col("text_extracted").alias("text"),
        F.size("outlinks").alias("n_links"),
    )

    # ---- href explosion → candidates (canonical already; dedup per round).
    # J4: redirect targets re-enter at the PARENT depth (no hop cost);
    # ordinary outlinks at depth+1.
    links = parsed.select(
        F.col("url_hash64").alias("origin_hash64"),
        (F.col("depth") + 1).alias("depth"),
        F.explode("outlinks").alias("url_canon"),
    )
    redirect_links = parsed.filter(F.col("redirect_canon").isNotNull()).select(
        F.col("url_hash64").alias("origin_hash64"),
        F.col("depth"),
        F.col("redirect_canon").alias("url_canon"),
    )
    links = links.unionByName(redirect_links)
    # D5/J6: persist the crawl link graph for `index -R` rank + lineage
    link_graph = links.select(
        F.col("origin_hash64").alias("src_hash64"),
        F.xxhash64("url_canon").alias("dst_hash64"),
        F.lit(round_id).alias("round"),
    )
    cand = (
        links.groupBy("url_canon")
        .agg(F.min(F.struct("depth", "origin_hash64")).alias("m"))
        .select(
            "url_canon",
            F.col("m.depth").alias("depth"),
            F.col("m.origin_hash64").alias("origin_hash64"),
        )
    )
    from ..operators.canonicalize import hash32_col, hash64_col, host_udf

    cand = (
        cand.withColumn("host", host_udf(F.col("url_canon")))
        .withColumn("url_hash64", hash64_col(F.col("url_canon")))
        .withColumn("hash32", hash32_col(F.col("url_canon")))
    )

    # ---- J1 URL-seen test (bloom + exact backstop) → definitely-new URLs
    # persisted: consumed by frontier rows, seen delta, and bloom add
    extra_persisted: list = []
    new_urls = seen_filter_new(
        cand, bloom, seen, config, persisted_out=extra_persisted
    ).persist()

    new_frontier_rows = new_urls.select(
        "url_canon",
        "url_hash64",
        "hash32",
        "host",
        "depth",
        F.lit(round_ts).cast("long").alias("next_fetch_unix"),
        F.lit(round_id).alias("round_added"),
        "origin_hash64",
        F.lit(config.tag).alias("tag"),
    )

    # ---- revisit scheduling (Period): fetched URLs return to the frontier
    revisit = scheduled.select(
        "url_canon",
        "url_hash64",
        "hash32",
        "host",
        "depth",
        (F.col("sched_unix") + F.lit(config.period_s)).cast("long").alias(
            "next_fetch_unix"
        ),
        F.lit(round_id).alias("round_added"),
        "origin_hash64",
        "tag",
    )

    frontier_cols = [
        "url_canon", "url_hash64", "hash32", "host", "depth",
        "next_fetch_unix", "round_added", "origin_hash64", "tag",
    ]
    new_frontier = (
        not_due.select(*frontier_cols)
        .unionByName(leftover.select(*frontier_cols))
        .unionByName(revisit.select(*frontier_cols))
        .unionByName(new_frontier_rows.select(*frontier_cols))
    )

    seen_delta = new_urls.select("url_canon", "url_hash64", "hash32").withColumn(
        "round_added", F.lit(round_id)
    )
    new_bloom = bloom_add(new_urls, bloom, config)

    return RoundResult(
        frontier=new_frontier,
        seen_delta=seen_delta,
        bloom=new_bloom,
        robots_delta=robots_delta,
        fetched=fetched,
        round_ts=round_ts,
        persisted=[parsed, scheduled, new_urls, robots_delta, found, allowed]
        + extra_persisted,
        scheduled=scheduled,
        new_urls=new_urls,
        links=link_graph,
    )
