"""Checkpoint/resume test (SURVEY.md §5.4, BASELINE.json:6,14):

a job killed after round k's commit resumes and produces frontier, seen set
and fetch order identical to an uninterrupted run — because round logic is a
pure function of committed snapshot state and round_id, and snapshots only
become visible at the atomic manifest publish.
"""

from __future__ import annotations

import pytest

from aspseek_spark.plans.crawl_loop import CrawlJob
from aspseek_spark.sources.tables import StateStore

N_ROUNDS = 3


def _mk_job(spark, tiny_web, test_config, root):
    pages = spark.read.parquet(f"{tiny_web}/pages.parquet")
    robots_src = spark.read.parquet(f"{tiny_web}/robots_src.parquet")
    seeds = spark.read.parquet(f"{tiny_web}/seeds.parquet")
    store = StateStore(root, spark)
    return CrawlJob(spark, store, test_config, pages, robots_src), seeds, store


def _fetch_seq(store):
    rows = store.read_fetched(N_ROUNDS).select(
        "round", "sched_unix", "host", "url_canon", "status"
    ).collect()
    return sorted(tuple(r) for r in rows)


def test_kill_after_commit_resumes_identically(
    spark, tiny_web, test_config, tmp_path_factory
):
    # uninterrupted reference run
    job_a, seeds, store_a = _mk_job(
        spark, tiny_web, test_config, str(tmp_path_factory.mktemp("a"))
    )
    job_a.run(seeds, N_ROUNDS)

    # interrupted run: stop ("kill") after round 1's commit, then a fresh
    # CrawlJob over the same store resumes from the manifest
    root_b = str(tmp_path_factory.mktemp("b"))
    job_b1, seeds_b, store_b = _mk_job(spark, tiny_web, test_config, root_b)
    job_b1.run(seeds_b, 1)
    assert store_b.last_committed_round() == 1

    job_b2, seeds_b2, store_b2 = _mk_job(spark, tiny_web, test_config, root_b)
    job_b2.run(seeds_b2, N_ROUNDS)

    assert _fetch_seq(store_a) == _fetch_seq(store_b2)
    seen_a = {r["url_canon"] for r in store_a.read_seen(N_ROUNDS).collect()}
    seen_b = {r["url_canon"] for r in store_b2.read_seen(N_ROUNDS).collect()}
    assert seen_a == seen_b
    fr_a = sorted(
        tuple(r)
        for r in store_a.read_frontier(N_ROUNDS)
        .select("url_canon", "depth", "next_fetch_unix")
        .collect()
    )
    fr_b = sorted(
        tuple(r)
        for r in store_b2.read_frontier(N_ROUNDS)
        .select("url_canon", "depth", "next_fetch_unix")
        .collect()
    )
    assert fr_a == fr_b


def test_mid_round_kill_leaves_state_invisible(
    spark, tiny_web, test_config, tmp_path_factory
):
    """A crash before the manifest publish must not change visible state:
    simulate by writing round files without publishing, then resuming."""
    import os

    root = str(tmp_path_factory.mktemp("c"))
    job, seeds, store = _mk_job(spark, tiny_web, test_config, root)
    job.run(seeds, 1)

    # fake a partial round-2: data dirs exist, manifest still says round 1
    os.makedirs(os.path.join(root, "frontier", "round=2"), exist_ok=True)
    with open(os.path.join(root, "frontier", "round=2", "junk"), "w") as f:
        f.write("partial write from a crashed attempt")
    assert store.last_committed_round() == 1

    job2, seeds2, store2 = _mk_job(spark, tiny_web, test_config, root)
    job2.run(seeds2, N_ROUNDS)  # overwrites the partial dir, commits 2..3
    assert store2.last_committed_round() == N_ROUNDS
    # and the result equals a clean run
    job_ref, seeds_ref, store_ref = _mk_job(
        spark, tiny_web, test_config, str(tmp_path_factory.mktemp("d"))
    )
    job_ref.run(seeds_ref, N_ROUNDS)
    assert _fetch_seq(store_ref) == _fetch_seq(store2)
