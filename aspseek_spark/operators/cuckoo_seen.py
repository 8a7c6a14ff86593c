"""Deletion-capable URL-seen state: partitioned CUCKOO filter (north_star:
"cuckoo-filter fallback for deletions"; SURVEY.md §2.4 A7).

Blooms cannot forget. When a crawl space must expire URLs (ASPseek tag
deletion / URL expiry — the reference DELETEs from ``urlword``), the probe
layer needs deletions too, or every expired URL stays "maybe seen" forever
and leans on the exact backstop. Two paths are provided:

  1. This module — the cuckoo fallback proper: same partitioned layout as
     the bloom (pid = pmod(murmur3(url), P), one filter blob per pid, built
     and mutated by cogrouped applyInPandas, never collected), but each
     partition is a partial-key cuckoo table (functions/hashing.CuckooFilter)
     supporting true O(1) deletes.
  2. operators/seen.seen_delete — the bloom path: deletes rewrite the exact
     ``seen`` table and REBUILD only the touched pids' blobs (bounded work:
     deleted-pid rows only; right at small delete rates, wasteful when
     deletion is frequent — which is when you switch to this module).

Correctness contract is identical to the bloom: a probe MISS is
definitely-new; HITs go through the exact backstop. Deletions must remove
the url from BOTH the exact seen table and this filter, in that order
(filter-side false positives are harmless; false negatives are impossible
for still-present keys because cuckoo delete only removes one matching
fingerprint copy per insert).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.hashing import CuckooFilter

CUCKOO_STATE_SCHEMA = "pid int, table binary, n_buckets int, n_keys long"


def _with_pid(df: DataFrame, p: int) -> DataFrame:
    return df.withColumn("pid", F.pmod(F.hash("url_canon"), F.lit(p)))


def _load(right: pd.DataFrame, n_buckets: int) -> CuckooFilter:
    if right.empty or right["table"].iloc[0] is None:
        return CuckooFilter(n_buckets)
    return CuckooFilter.from_bytes(
        bytes(right["table"].iloc[0]), int(right["n_buckets"].iloc[0])
    )


def cuckoo_add(
    urls: DataFrame, state: DataFrame, config: CrawlConfig,
    n_buckets_per_partition: int = 1 << 14,
) -> DataFrame:
    """Insert url_canon keys into their pid's cuckoo table (cogrouped)."""
    keys = _with_pid(urls.select("url_canon"), config.bloom_partitions)

    def _add(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty and right.empty:
            return pd.DataFrame(columns=["pid", "table", "n_buckets", "n_keys"])
        pid = int((left if not left.empty else right)["pid"].iloc[0])
        nb = (
            int(right["n_buckets"].iloc[0])
            if not right.empty
            else n_buckets_per_partition
        )
        cf = _load(right, nb)
        n0 = int(right["n_keys"].iloc[0]) if not right.empty else 0
        for u in left["url_canon"]:
            if not cf.insert(u):
                raise RuntimeError(
                    f"cuckoo partition {pid} over capacity — grow "
                    "n_buckets_per_partition or repartition"
                )
        return pd.DataFrame(
            {"pid": [pid], "table": [cf.to_bytes()],
             "n_buckets": [nb], "n_keys": [n0 + len(left)]}
        )

    return (
        keys.groupby("pid")
        .cogroup(state.groupby("pid"))
        .applyInPandas(_add, schema=CUCKOO_STATE_SCHEMA)
    )


def cuckoo_delete(
    urls: DataFrame, state: DataFrame, config: CrawlConfig
) -> DataFrame:
    """Delete url_canon keys from their pid's cuckoo table — true deletion,
    no rebuild; untouched pids pass through unchanged."""
    keys = _with_pid(urls.select("url_canon"), config.bloom_partitions)

    def _del(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if right.empty:
            # deleting from a pid with no state is a no-op (emit nothing)
            return pd.DataFrame(columns=["pid", "table", "n_buckets", "n_keys"])
        pid = int(right["pid"].iloc[0])
        nb = int(right["n_buckets"].iloc[0])
        cf = _load(right, nb)
        n = int(right["n_keys"].iloc[0])
        for u in left["url_canon"]:
            if cf.delete(u):
                n -= 1
        return pd.DataFrame(
            {"pid": [pid], "table": [cf.to_bytes()],
             "n_buckets": [nb], "n_keys": [max(n, 0)]}
        )

    return (
        keys.groupby("pid")
        .cogroup(state.groupby("pid"))
        .applyInPandas(_del, schema=CUCKOO_STATE_SCHEMA)
    )


def cuckoo_probe(
    candidates: DataFrame, state: DataFrame, config: CrawlConfig
) -> DataFrame:
    """candidates(+url_canon) → + maybe_seen (same contract as bloom_probe:
    False = definitely new, True = consult the exact backstop)."""
    cand = _with_pid(candidates, config.bloom_partitions)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields
    ) + ", maybe_seen boolean"

    def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return left.assign(maybe_seen=pd.Series([], dtype=bool))
        if right.empty or right["table"].iloc[0] is None:
            return left.assign(maybe_seen=False)
        cf = _load(right, int(right["n_buckets"].iloc[0]))
        return left.assign(
            maybe_seen=[cf.contains(u) for u in left["url_canon"]]
        )

    return (
        cand.groupby("pid")
        .cogroup(state.groupby("pid"))
        .applyInPandas(_probe, schema=out_schema)
    )
