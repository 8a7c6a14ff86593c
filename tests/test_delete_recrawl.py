"""URL expiry / tag deletion → re-crawl (north_star: cuckoo fallback for
deletions; reference: DELETE from urlword then re-discovery).

Two layers:
  1. cuckoo_seen operator: true deletes in the partitioned filter state —
     deleted keys stop probing as seen, remaining keys never false-negative.
  2. end-to-end: after N rounds, expire one fetched URL (seen + frontier +
     filter state via StateStore.delete_urls); the next rounds re-discover
     and re-fetch it exactly like an oracle whose state got the same
     deletion.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aspseek_spark.config import CrawlConfig
from aspseek_spark.operators.cuckoo_seen import (
    cuckoo_add,
    cuckoo_delete,
    cuckoo_probe,
)
from aspseek_spark.oracle.model_crawler import crawl, load_fixture_dicts
from aspseek_spark.plans.crawl_loop import CrawlJob
from aspseek_spark.sources.tables import StateStore


@pytest.fixture()
def cfg():
    return CrawlConfig(
        bloom_partitions=4,
        bloom_bits_per_partition=1 << 14,
        bloom_num_hashes=5,
        host_budget=4,
    )


def test_cuckoo_state_add_delete_probe(spark, cfg):
    urls = spark.createDataFrame(
        [(f"http://h{i % 7}.test/p{i}",) for i in range(200)], "url_canon string"
    )
    empty = spark.createDataFrame([], "pid int, table binary, n_buckets int, n_keys long")
    state = cuckoo_add(urls, empty, cfg)
    probed = cuckoo_probe(urls, state, cfg)
    assert probed.filter(~F.col("maybe_seen")).count() == 0  # no false negs

    doomed = urls.filter(F.xxhash64("url_canon") % 3 == 0)
    kept = urls.filter(F.xxhash64("url_canon") % 3 != 0)
    n_doomed = doomed.count()
    assert 0 < n_doomed < 200
    state2 = cuckoo_delete(doomed, state, cfg)
    # deleted keys no longer probe as seen (fp collisions ~0 at this load)
    gone = cuckoo_probe(doomed, state2, cfg)
    assert gone.filter(F.col("maybe_seen")).count() == 0
    # remaining keys still have no false negatives
    still = cuckoo_probe(kept, state2, cfg)
    assert still.filter(~F.col("maybe_seen")).count() == 0


def test_delete_then_recrawl_matches_oracle(spark, tiny_web, tmp_path):
    """Expire one URL after round 2 → rounds 3-4 re-discover and re-fetch it
    identically to the oracle given the same deletion schedule. Period ==
    round interval so every page revisits each round — re-discovery of the
    expired URL (via its parent's re-parse) is guaranteed, not incidental."""
    cfg = CrawlConfig(
        period_s=3600,
        round_interval_s=3600,
        host_budget=4,
        bloom_partitions=8,
        bloom_bits_per_partition=1 << 16,
        bloom_num_hashes=5,
    )
    store = StateStore(str(tmp_path / "state"), spark)
    job = CrawlJob(
        spark,
        store,
        cfg,
        spark.read.parquet(f"{tiny_web}/pages.parquet"),
        spark.read.parquet(f"{tiny_web}/robots_src.parquet"),
    )
    seeds = spark.read.parquet(f"{tiny_web}/seeds.parquet")
    job.run(seeds, 2)

    # Choose a target the ORACLE confirms is re-discoverable after deletion
    # (S7 means stale parents answer 304 on revisit and never re-parse, so
    # not every deleted URL re-surfaces within the horizon). The oracle is
    # pure Python and instant at this scale — consult it per candidate.
    pages, robots_src, seed_urls = load_fixture_dicts(tiny_web)
    base2 = crawl(pages, robots_src, seed_urls, cfg, 2)
    candidates = sorted(
        u for u, r in base2.frontier.items()
        if u in base2.seen and r.depth > 0
    )
    target = None
    for u in candidates[:40]:
        trial = crawl(pages, robots_src, seed_urls, cfg, 4, deletions={2: {u}})
        if u in trial.seen:
            target = u
            break
    assert target is not None, "no re-discoverable URL in the first 40"

    deletions = {2: {target}}
    store.delete_urls(2, [target], cfg)
    assert store.read_seen(2).filter(F.col("url_canon") == target).count() == 0
    assert (
        store.read_frontier(2).filter(F.col("url_canon") == target).count() == 0
    )

    job.run(seeds, 4)  # resumes at round 3

    ora = crawl(pages, robots_src, seed_urls, cfg, 4, deletions=deletions)

    eng = sorted(
        (r["round"], r["sched_unix"], r["host"], r["url_canon"], r["status"])
        for r in store.read_fetched(4).collect()
    )
    exp = sorted(
        (f.round, f.sched_unix, f.host, f.url_canon, f.status)
        for f in ora.fetches
    )
    assert eng == exp
    eng_seen = {r["url_canon"] for r in store.read_seen(4).collect()}
    assert eng_seen == ora.seen
    # the expired URL was re-discovered on both sides
    assert target in eng_seen and target in ora.seen
