"""qcache analog ([R:src/qcache.cpp]; round-3 verdict missing #2 / next-
round #4): repeated-query result caching on the SearchJob serving face.

Done-criteria from the verdict: a repeated query plans zero new shuffle
jobs (plan-based assertion: the repeat is the SAME materialized DataFrame
and its physical plan is an InMemoryTableScan), and an index append
invalidates — identical answers to a fresh computation afterwards.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from aspseek_spark.plans.search_job import SearchJob

FETCHED_SCHEMA = (
    "round int, url_canon string, url_hash64 long, host string, "
    "depth int, status int, text string"
)


@pytest.fixture(scope="module")
def qjob(spark, tmp_path_factory):
    rows = [
        (1, f"http://h{i % 4}.test/p{i}", i, f"h{i % 4}.test", 1, 200,
         f"spark data word{i} crawl index merge")
        for i in range(40)
    ]
    fetched = spark.createDataFrame(rows, FETCHED_SCHEMA)
    job = SearchJob(
        spark, str(tmp_path_factory.mktemp("qcache_idx")), n_buckets=16
    )
    job.build_from_fetched(fetched)
    return job


def _docs(df):
    return {(r["doc"], r["score"]) for r in df.collect()}


def test_repeat_query_serves_from_cache(qjob):
    fresh = _docs(qjob.search_and(["spark", "data"]))
    r1 = qjob.search_cached("and", ["spark", "data"])
    assert _docs(r1) == fresh
    assert (qjob.qcache_hits, qjob.qcache_misses) == (0, 1)

    r2 = qjob.search_cached("and", ["spark", "data"])
    assert r2 is r1, "repeat must return the SAME materialized result"
    assert qjob.qcache_hits == 1
    # plan-based zero-new-shuffle proof: after materialization the physical
    # plan is an in-memory scan — re-collecting runs no Exchange
    buf = io.StringIO()
    with redirect_stdout(buf):
        r2.explain("formatted")
    assert "InMemoryTableScan" in buf.getvalue()
    assert _docs(r2) == fresh


def test_query_normalization_shares_entries(qjob):
    a = qjob.search_cached("and", ["data", "spark"])  # set semantics
    b = qjob.search_cached("and", ["SPARK", "data"])  # case-insensitive
    assert a is b


def test_index_append_invalidates(qjob, spark):
    before = qjob.search_cached("and", ["spark", "data"])
    delta = spark.createDataFrame(
        [(2, "http://h9.test/new", 900, "h9.test", 1, 200,
          "spark data appended")],
        FETCHED_SCHEMA,
    )
    qjob.merge_delta(delta)
    after = qjob.search_cached("and", ["spark", "data"])
    assert after is not before, "version flip must invalidate"
    got = _docs(after)
    assert (900, 2) in got
    assert got == _docs(qjob.search_and(["spark", "data"]))
    # the replaced entry was unpersisted (no cache-memory leak across epochs)
    assert not before.storageLevel.useMemory


def test_version_flip_sweeps_all_stale_entries(spark, tmp_path_factory):
    """Round-4 ADVICE: a version flip must unpersist EVERY stale entry at
    flip time — not only a same-key re-access — so no stale persisted
    DataFrame survives to recompute against a GC'd generation."""
    rows = [
        (1, f"http://h0.test/p{i}", i, "h0.test", 1, 200,
         f"u{i} shared words here")
        for i in range(6)
    ]
    job = SearchJob(
        spark, str(tmp_path_factory.mktemp("qcache_sweep")), n_buckets=4
    )
    job.build_from_fetched(spark.createDataFrame(rows, FETCHED_SCHEMA))
    cached = [job.search_cached("and", [f"u{i}"]) for i in range(4)]
    assert all(df.storageLevel.useMemory for df in cached)
    delta = spark.createDataFrame(
        [(2, "http://h0.test/new", 99, "h0.test", 1, 200, "u0 flipped")],
        FETCHED_SCHEMA,
    )
    job.merge_delta(delta)  # the flip itself sweeps — no lookup needed
    assert len(job._qcache) == 0
    assert all(not df.storageLevel.useMemory for df in cached)


def test_lru_eviction_unpersists(spark, tmp_path_factory):
    rows = [
        (1, f"http://h0.test/p{i}", i, "h0.test", 1, 200, f"w{i} common")
        for i in range(8)
    ]
    job = SearchJob(
        spark, str(tmp_path_factory.mktemp("qcache_lru")), n_buckets=4,
        qcache_entries=2,
    )
    job.build_from_fetched(spark.createDataFrame(rows, FETCHED_SCHEMA))
    d0 = job.search_cached("and", ["w0"])
    job.search_cached("and", ["w1"])
    job.search_cached("and", ["w2"])  # evicts w0
    assert len(job._qcache) == 2
    assert not d0.storageLevel.useMemory
    # w0 is a miss again; w2 (most recent) is a hit
    job.qcache_hits = job.qcache_misses = 0
    job.search_cached("and", ["w0"])
    job.search_cached("and", ["w2"])
    assert (job.qcache_hits, job.qcache_misses) == (1, 1)


def test_link_query_df_arg_cache_contract(qjob, spark):
    """Round-5 verdict wrong #1: a `link:` query takes a links_to DataFrame
    — keying on object identity would both miss forever AND pin the
    DataFrame in the key. Contract: without a links_version token the query
    is computed UNCACHED (no entry retained); with one, two equal,
    separately-read graphs share an entry."""
    def graph():
        return spark.createDataFrame(
            [(i, "http://h0.test/p0") for i in range(40)],
            "doc long, target string",
        )

    q = "spark & link:http://h0.test/p0"
    before = len(qjob._qcache)
    h0, m0 = qjob.qcache_hits, qjob.qcache_misses
    r1 = qjob.search_cached("query", q, links_to=graph())
    r2 = qjob.search_cached("query", q, links_to=graph())
    assert len(qjob._qcache) == before, "no entry may pin a DataFrame arg"
    assert qjob.qcache_misses == m0 + 2 and qjob.qcache_hits == h0
    want = {r["doc"] for r in r1.collect()}
    assert want == {r["doc"] for r in r2.collect()}

    # with a version token: second read of an EQUAL graph is a cache hit
    c1 = qjob.search_cached("query", q, links_to=graph(), links_version=7)
    c2 = qjob.search_cached("query", q, links_to=graph(), links_version=7)
    assert c2 is c1
    assert qjob.qcache_hits == h0 + 1
    assert {r["doc"] for r in c1.collect()} == want
    # a DIFFERENT version token misses (graph may have changed)
    qjob.search_cached("query", q, links_to=graph(), links_version=8)
    assert qjob.qcache_misses == m0 + 4
