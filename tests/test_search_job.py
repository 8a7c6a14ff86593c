"""SearchJob: every query family served from the STORED bucketed index
must return identical answers to the inline-tokenize computation over the
same documents, and query-time scans must partition-prune (round-2 verdict
next-step #5 'done' criteria)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from aspseek_spark.operators.postings import (
    build_postings,
    build_zone_postings,
    docs_with_all,
    docs_with_any,
    docs_without,
    expand_terms,
    phrase_match,
    proximity_match,
    rank_zone_weighted,
)
from aspseek_spark.plans.search_job import SearchJob

WORDS = ["spark", "data", "index", "crawl", "merge", "table", "rank"]


@pytest.fixture(scope="module")
def fetched_fixture(spark):
    """Synthetic crawl output in the fetched-table shape, including a
    revisit: url 0 appears in rounds 1 AND 2 with different text — the
    index must keep only round 2's body."""
    rows = []
    for i in range(120):
        text = " ".join(
            WORDS[(i + j) % len(WORDS)] for j in range(3 + i % 5)
        ) + f" filler{i}"
        rows.append(
            (1, f"http://h{i % 9:02d}.test/p{i}", i, f"h{i % 9:02d}.test",
             1, 200, text)
        )
    # revisit of doc 0 with NEW text (old text had no 'merge')
    rows.append(
        (2, "http://h00.test/p0", 0, "h00.test", 1, 200, "merge rank fresh")
    )
    # a 404 and a 304 must not be indexed
    rows.append((1, "http://h00.test/miss", 900, "h00.test", 1, 404, None))
    rows.append((2, "http://h01.test/p1", 1, "h01.test", 1, 304, None))
    return spark.createDataFrame(
        rows,
        "round int, url_canon string, url_hash64 long, host string, "
        "depth int, status int, text string",
    )


@pytest.fixture(scope="module")
def inline_docs(spark, fetched_fixture):
    """The ground-truth docs set (latest 200 text per url) + inline postings."""
    docs = (
        fetched_fixture.filter(
            (F.col("status") == 200) & F.col("text").isNotNull()
        )
        .groupBy("url_hash64")
        .agg(
            F.max_by("text", "round").alias("text"),
            F.max_by("host", "round").alias("host"),
        )
        .select(F.col("url_hash64").alias("doc_id"), "host", "text")
    )
    return docs.localCheckpoint()


@pytest.fixture(scope="module")
def search_job(spark, fetched_fixture, tmp_path_factory):
    job = SearchJob(
        spark, str(tmp_path_factory.mktemp("search_idx")), n_buckets=16
    )
    job.build_from_fetched(fetched_fixture)
    return job


def _docs(df, col="doc"):
    return {r[col] for r in df.collect()}


def test_revisit_replaces_old_body(search_job):
    # doc 0's round-1 text is gone: its round-2 text has 'merge', and the
    # round-1-only word 'filler0' must not hit doc 0 anymore
    assert 0 in _docs(search_job.search_and(["merge"]))
    assert 0 not in _docs(search_job.search_and(["filler0"]))


def test_and_or_not_match_inline(search_job, inline_docs):
    inline = build_postings(inline_docs, "doc_id", "text")
    for terms in (["spark", "data"], ["crawl"], ["merge", "rank"]):
        assert _docs(search_job.search_and(terms)) == _docs(
            docs_with_all(inline, terms)
        ), terms
    assert _docs(search_job.search_any(["spark", "merge"])) == _docs(
        docs_with_any(inline, ["spark", "merge"])
    )
    got = search_job.search_not(["spark"], "merge")
    want = docs_without(docs_with_all(inline, ["spark"]), inline, "merge")
    assert _docs(got) == _docs(want)


def test_phrase_and_proximity_match_inline(search_job, inline_docs):
    inline = build_postings(inline_docs, "doc_id", "text")
    assert _docs(search_job.search_phrase("spark", "data")) == _docs(
        phrase_match(inline, "spark", "data")
    )
    assert _docs(search_job.search_proximity("spark", "index", 3)) == _docs(
        proximity_match(inline, "spark", "index", 3)
    )


def test_morphology_matches_inline(search_job, inline_docs):
    inline = build_postings(inline_docs, "doc_id", "text")
    terms = ["table"]
    expanded = expand_terms(terms)
    got = {(r["doc"], r["score"]) for r in search_job.search_any_form(terms).collect()}
    want = {
        (r["doc"], r["score"])
        for r in docs_with_any(inline, expanded).collect()
    }
    assert got == want


def test_zone_rank_matches_inline(search_job, inline_docs):
    inline_zp = build_zone_postings(inline_docs, "doc_id", "text")
    got = [
        (r["doc"], r["score"])
        for r in search_job.search_zone_ranked(["spark", "rank"], k=10).collect()
    ]
    want = [
        (r["doc"], r["score"])
        for r in rank_zone_weighted(inline_zp, ["spark", "rank"], k=10).collect()
    ]
    assert got == want


def test_site_grouped_paging(search_job, inline_docs):
    """J9/W4: one best hit per site, deterministic paging."""
    res = search_job.search_ranked(
        ["spark"], page=0, page_size=5, one_per_site=True
    ).collect()
    assert 0 < len(res) <= 5
    hosts = [r["host"] for r in res]
    assert len(hosts) == len(set(hosts)), "one hit per site"


def test_query_time_scan_partition_prunes(search_job):
    probe = search_job.probe(["spark", "merge"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "word_bucket" in plan, plan


def test_lsm_merge_delta(search_job, spark):
    """SNK2 refresh: a later round's fetched delta merges into the stored
    index — new words become searchable, old postings survive."""
    delta = spark.createDataFrame(
        [(3, "http://h05.test/new", 500, "h05.test", 1, 200,
          "brandnew spark docdelta")],
        "round int, url_canon string, url_hash64 long, host string, "
        "depth int, status int, text string",
    )
    search_job.merge_delta(delta)
    assert 500 in _docs(search_job.search_and(["brandnew"]))
    assert 500 in _docs(search_job.search_and(["spark"]))
    # pre-merge postings intact
    assert 0 in _docs(search_job.search_and(["merge"]))
