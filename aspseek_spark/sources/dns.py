"""DNS resolve + cache seam (SURVEY.md §2.1 SRC4).

Reference behavior: the indexing robot resolves each new host once, caches
the address, and reuses it for every connection to that host; resolution
failures mark the host's URLs unfetchable. No live network exists in this
sandbox, so — exactly like the SRC2 HTTP connector (sources/connector.py)
— this module ships the PROVEN SEAM: the cache-table semantics, the
Arrow-batched per-partition resolve operator, and the resolver protocol a
production transport implements, with a deterministic mock standing in for
the OS resolver.

  dns cache table:  host, addr (null = NXDOMAIN/failure), resolved_unix,
                    ttl_unix — same append-only delta pattern as the
                    robots cache (one resolve per host, ever, until TTL).
  resolve_missing:  due hosts not cached (or whose TTL expired) →
                    mapInPandas batch resolve → rows to append. The
                    resolver object is opened ONCE PER PARTITION — the
                    shape a real resolver pool (socket.getaddrinfo /
                    aiodns) needs.
  RESOLVER DROP-IN: replace MockResolver with

      class SystemResolver:
          def resolve(self, host: str) -> str | None:
              try:
                  return socket.getaddrinfo(host, 80)[0][4][0]
              except OSError:
                  return None

  keeping the operator, schema and TTL semantics byte-for-byte as is.

A live fetcher composes this in front of the HTTP transport: scheduled
batch → semi-join against dns(addr IS NOT NULL) → fetch. The crawl's
simulated fetch join needs no resolution, so run_round does not call this
by default — the capability is tested end-to-end against the cache-table
semantics in tests/test_dns.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import md5

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DNS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        # null addr = authoritative failure (NXDOMAIN / timeout): cached
        # too, so a dead host is not re-resolved every round before TTL
        T.StructField("addr", T.StringType()),
        T.StructField("resolved_unix", T.LongType()),
        T.StructField("ttl_unix", T.LongType()),
    ]
)


def empty_dns(spark) -> DataFrame:
    return spark.createDataFrame([], DNS_SCHEMA)


class MockResolver:
    """Deterministic resolver for fixtures: explicit overrides win, any
    other host resolves to a stable md5-derived address; hosts in ``dead``
    fail (None). Pickled to executors like MockTransport."""

    def __init__(self, overrides: dict[str, str] | None = None,
                 dead: set[str] | None = None):
        self._overrides = overrides or {}
        self._dead = dead or set()

    def resolve(self, host: str) -> str | None:
        if host in self._dead:
            return None
        if host in self._overrides:
            return self._overrides[host]
        d = md5(host.encode()).digest()
        return f"10.{d[0]}.{d[1]}.{d[2]}"


def resolve_missing(
    hosts: DataFrame,
    dns_cache: DataFrame,
    resolver,
    round_ts: int,
    ttl_s: int = 24 * 3600,
    hosts_deduped: bool = False,
) -> DataFrame:
    """Hosts needing (re-)resolution → freshly resolved cache rows.

    Needs-resolution = not in the cache at all, OR cached with an expired
    TTL. The cache side is semi/anti-joined down to THIS batch's hosts
    first (same discipline as the robots cache: the full cache grows with
    every host ever crawled and must never be broadcast whole).
    """
    need = hosts.select("host")
    if not hosts_deduped:
        need = need.distinct()
    live = dns_cache.filter(F.col("ttl_unix") > F.lit(round_ts)).select("host")
    missing = need.join(live, "host", "left_anti")

    out_schema = "host string, addr string, resolved_unix long, ttl_unix long"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a real resolver would open its socket pool HERE, once per
        # partition, and close it after the iterator drains
        for pdf in batches:
            addrs = [resolver.resolve(h) for h in pdf["host"]]
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "addr": addrs,
                    "resolved_unix": round_ts,
                    "ttl_unix": round_ts + ttl_s,
                }
            )

    return missing.mapInPandas(_op, schema=out_schema)


def resolvable_hosts(dns_cache: DataFrame, round_ts: int) -> DataFrame:
    """Hosts a fetcher may connect to: resolved, non-failed, TTL-live."""
    return dns_cache.filter(
        F.col("addr").isNotNull() & (F.col("ttl_unix") > F.lit(round_ts))
    ).select("host", "addr")
