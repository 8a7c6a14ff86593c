"""robots.txt fetch, parse, cache & allow filter (SURVEY.md SRC3/F4/J2).

Reference behavior: robots.txt is fetched once per new host, parsed, cached
in the MySQL ``robots`` table, and consulted before every fetch
([R:src/robots.cpp], BASELINE.json:6). Here:

  - the ``robots`` DataFrame is the cache: host, rules
    array<struct<allow:boolean,path:string>>, status, fetched_unix
  - hosts that are due but missing from the cache get a robots fetch first
    (simulated-fetch join against robots_src — the same seam a live
    ``mapInPandas`` HTTP connector would slot into), parsed by an
    Arrow-batched pandas UDF sharing ``parse_robots`` with the oracle
  - the allow decision joins candidates to the cache on host (broadcast
    when the cache is small; at 10^10 scale the cache is itself large →
    plain shuffle join, AQE handles skewed hosts) and applies the shared
    longest-match ``robots_allowed`` rule in a vectorized UDF
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.robots import parse_robots_full, path_of, robots_allowed

RULES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("allow", T.BooleanType()),
            T.StructField("path", T.StringType()),
        ]
    )
)
PARSED_TYPE = T.StructType(
    [
        T.StructField("rules", RULES_TYPE),
        T.StructField("crawl_delay", T.IntegerType()),
    ]
)
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("rules", RULES_TYPE),
        T.StructField("crawl_delay", T.IntegerType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("fetched_unix", T.LongType()),
    ]
)


def empty_robots(spark) -> DataFrame:
    return spark.createDataFrame([], ROBOTS_SCHEMA)


def fetch_missing_robots(
    hosts: DataFrame,
    robots: DataFrame,
    robots_src: DataFrame,
    user_agent: str,
    round_ts: int,
    hosts_deduped: bool = False,
    period_s: int | None = None,
) -> DataFrame:
    """Hosts without a FRESH cache entry → fetch+parse → rows to append.

    ``hosts``: one column ``host``. Missing from robots_src = unfetchable
    robots (status 404 → allow-all empty rules). Pass hosts_deduped=True
    when the caller already distinct'ed (skips a redundant shuffle).
    ``period_s`` (SRC3 TTL): entries older than this no longer count as
    cached, so their hosts re-fetch — the re-fetched generation is simply
    APPENDED to the cache; robots_allow_filter takes the newest per host.
    None = cache forever (prior behavior).
    """
    # the due-host set is bounded per round; the robots cache is the big
    # side at 10^10 scale. Probe the small set INTO the cache (broadcast
    # semi — cache only scanned, never shuffled), then broadcast-anti the
    # confirmed hits out: no sort-merge exchange anywhere.
    due_hosts = hosts if hosts_deduped else hosts.select("host").distinct()
    fresh = robots
    if period_s is not None:
        fresh = robots.filter(
            F.col("fetched_unix") + F.lit(period_s) > F.lit(round_ts)
        )
    cached = fresh.select("host").join(
        F.broadcast(due_hosts), on="host", how="left_semi"
    )
    missing = due_hosts.join(F.broadcast(cached), on="host", how="left_anti")
    fetched = missing.join(robots_src, on="host", how="left")

    @F.pandas_udf(PARSED_TYPE)
    def parse_udf(bodies: pd.Series) -> pd.DataFrame:
        rules_out, delay_out = [], []
        for b in bodies:
            if b is None:
                rules_out.append([])
                delay_out.append(None)
                continue
            rules, delay = parse_robots_full(bytes(b), user_agent)
            rules_out.append(
                [{"allow": a, "path": p} for a, p in rules]
            )
            delay_out.append(delay)
        return pd.DataFrame({"rules": rules_out, "crawl_delay": delay_out})

    parsed = fetched.select(
        "host",
        parse_udf(F.col("body")).alias("_p"),
        F.when(F.col("body").isNotNull(), F.lit(200))
        .otherwise(F.lit(404))
        .alias("status"),
        F.lit(round_ts).cast("long").alias("fetched_unix"),
    )
    return parsed.select(
        "host",
        F.col("_p.rules").alias("rules"),
        F.col("_p.crawl_delay").alias("crawl_delay"),
        "status",
        "fetched_unix",
    )


def robots_allow_filter(
    candidates: DataFrame,
    robots: DataFrame,
    broadcast_cache: bool = True,
    due_hosts: DataFrame | None = None,
    dedup_generations: bool = True,
) -> DataFrame:
    """candidates(+url_canon, host) → + robots_ok boolean.

    When ``due_hosts`` is given, the cache is first semi-joined down to
    this round's hosts BEFORE any broadcast: the full cache grows with
    every host ever crawled (~10^7-10^8 at the 10^10-URL design point,
    ≫ broadcastable), but the due-host slice is bounded by the round —
    the cache is only ever SCANNED, never shuffled and never broadcast
    whole (round-1 verdict fix #3). broadcast_cache=False falls back to a
    plain shuffle join (AQE skew handling covers hot hosts).
    """
    cache = robots.select("host", "rules", "crawl_delay", "fetched_unix")
    if due_hosts is not None:
        cache = cache.join(F.broadcast(due_hosts), on="host", how="left_semi")
    if dedup_generations:
        # TTL re-fetches APPEND a new generation per host; the newest rules
        # (and Crawl-delay) win. The dedup runs on the due-host slice
        # (bounded per round), never on the full cache. fetched_unix is
        # strictly increasing per host (one fetch per host per round), so
        # max_by is deterministic. Callers with a TTL-free cache (at most
        # one row per host by construction) skip this and save the
        # aggregation exchange.
        cache = cache.groupBy("host").agg(
            F.max_by("rules", "fetched_unix").alias("rules"),
            F.max_by("crawl_delay", "fetched_unix").alias("crawl_delay"),
        )
    else:
        cache = cache.drop("fetched_unix")
    if broadcast_cache:
        cache = F.broadcast(cache)
    joined = candidates.join(cache, on="host", how="left")

    @F.pandas_udf(T.BooleanType())
    def allowed_udf(url_canon: pd.Series, rules: pd.Series) -> pd.Series:
        out = []
        for u, r in zip(url_canon, rules):
            if r is None or len(r) == 0:
                out.append(True)
                continue
            rule_list = [(d["allow"], d["path"]) for d in r]
            out.append(robots_allowed(rule_list, path_of(u)))
        return pd.Series(out, dtype=bool)

    return joined.withColumn(
        "robots_ok", allowed_udf(F.col("url_canon"), F.col("rules"))
    ).drop("rules")
