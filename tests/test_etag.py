"""S7 ETag / If-None-Match conditional revisit (RFC 9110 §13.1.2).

Validator-selection semantics (engine plans/crawl_round.py `not_modified`
and oracle model_crawler.py share them):

  - server ETag present AND a stored validator exists → If-None-Match
    decides ALONE: equal etag → 304 even when Last-Modified claims the
    page changed; different etag → re-fetch even when Last-Modified is
    stale.
  - otherwise → If-Modified-Since fallback (last_modified vs last fetch).

The fixture covers: etag+fresh-LM (etag wins → 304), no-etag+fresh-LM
(LM rule → 200 re-fetch), etag+stale-LM (304 via either), etag-only with
NO Last-Modified (304 only reachable via etag). A second corpus version
rotates one page's etag to prove a changed validator forces a re-fetch
despite a stale Last-Modified.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aspseek_spark.config import CrawlConfig, EPOCH_UNIX
from aspseek_spark.functions.textextract import extract1
from aspseek_spark.oracle.model_crawler import crawl, load_fixture_dicts
from aspseek_spark.plans.crawl_loop import CrawlJob
from aspseek_spark.sources.tables import StateStore

N_ROUNDS = 3
FUTURE = EPOCH_UNIX + 10 * 365 * 86400
PAST = EPOCH_UNIX - 30 * 86400


def _page(body: str) -> bytes:
    return f"<html><body>{body}</body></html>".encode()


ROOT_HTML = _page(
    'root <a href="/etag-fresh.html">a</a> <a href="/noetag-fresh.html">b</a>'
    ' <a href="/etag-stale.html">c</a> <a href="/etag-only.html">d</a>'
    ' <a href="/rotating.html">e</a>'
)


def _write_web(out, rotating_etag: str) -> str:
    # (url, html, content_type, last_modified, etag)
    rows = [
        ("http://e.test/", ROOT_HTML, "text/html", FUTURE, '"root-v1"'),
        # ETag beats a "modified" Last-Modified → 304 on revisit
        ("http://e.test/etag-fresh.html", _page("ef"), "text/html", FUTURE, '"ef-1"'),
        # no ETag → Last-Modified rule → re-fetch every revisit
        ("http://e.test/noetag-fresh.html", _page("nf"), "text/html", FUTURE, None),
        # ETag + stale LM → 304 via either validator
        ("http://e.test/etag-stale.html", _page("es"), "text/html", PAST, '"es-1"'),
        # ETag is the ONLY validator (no Last-Modified at all)
        ("http://e.test/etag-only.html", _page("eo"), "text/html", None, '"eo-1"'),
        # etag rotated between corpus versions; LM always stale
        ("http://e.test/rotating.html", _page("rot"), "text/html", PAST, rotating_etag),
    ]
    tbl = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([0] * len(rows), pa.timestamp("us", tz="UTC")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([extract1(r[1]) for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "content_type": pa.array([r[2] for r in rows], pa.string()),
            "last_modified": pa.array([r[3] for r in rows], pa.int64()),
            "etag": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(out / "pages.parquet"))
    pq.write_table(
        pa.table(
            {
                "host": pa.array(["e.test"], pa.string()),
                "body": pa.array([b"User-agent: *\nDisallow:\n"], pa.binary()),
            }
        ),
        str(out / "robots_src.parquet"),
    )
    pq.write_table(
        pa.table({"url": pa.array(["http://e.test/"], pa.string())}),
        str(out / "seeds.parquet"),
    )
    return str(out)


@pytest.fixture(scope="module")
def etag_web(tmp_path_factory):
    return _write_web(tmp_path_factory.mktemp("web_etag"), '"rot-v1"')


@pytest.fixture(scope="module")
def etag_web_v2(tmp_path_factory):
    """Same corpus, but rotating.html's ETag changed (content revision)."""
    return _write_web(tmp_path_factory.mktemp("web_etag_v2"), '"rot-v2"')


@pytest.fixture(scope="module")
def etag_config():
    return CrawlConfig(
        period_s=3600,  # + delta 0 → every fetched URL due again next round
        round_interval_s=3600,
        delta_time_s=0,
        host_budget=8,
        bloom_partitions=4,
        bloom_bits_per_partition=1 << 14,
        bloom_num_hashes=5,
    )


@pytest.fixture(scope="module")
def runs(spark, etag_web, etag_config, tmp_path_factory):
    store = StateStore(str(tmp_path_factory.mktemp("state_etag")), spark)
    job = CrawlJob(
        spark,
        store,
        etag_config,
        spark.read.parquet(f"{etag_web}/pages.parquet"),
        spark.read.parquet(f"{etag_web}/robots_src.parquet"),
    )
    job.run(spark.read.parquet(f"{etag_web}/seeds.parquet"), N_ROUNDS)
    pages, robots_src, seeds = load_fixture_dicts(etag_web)
    ora = crawl(pages, robots_src, seeds, etag_config, N_ROUNDS)
    return store, ora


def _statuses(store, suffix: str) -> list[tuple[int, int]]:
    return sorted(
        (r["round"], r["status"])
        for r in store.read_fetched(N_ROUNDS).collect()
        if r["url_canon"].endswith(suffix)
    )


def test_fetch_order_with_etag_matches_oracle(runs):
    store, ora = runs
    eng = sorted(
        (
            r["round"], r["sched_unix"], r["host"], r["url_canon"],
            r["status"], r["text"],
        )
        for r in store.read_fetched(N_ROUNDS).collect()
    )
    exp = sorted(
        (f.round, f.sched_unix, f.host, f.url_canon, f.status, f.text)
        for f in ora.fetches
    )
    assert eng == exp
    assert 304 in {s for (_, _, _, _, s, _) in eng}


def test_etag_beats_fresh_last_modified(runs):
    """If-None-Match wins: unchanged etag → 304 even though Last-Modified
    claims the page was modified (FUTURE)."""
    store, _ = runs
    st = _statuses(store, "/etag-fresh.html")
    assert st[0][1] == 200 and all(s == 304 for _, s in st[1:])
    assert len(st) >= 2


def test_no_etag_falls_back_to_last_modified(runs):
    store, _ = runs
    st = _statuses(store, "/noetag-fresh.html")
    assert all(s == 200 for _, s in st) and len(st) >= 2


def test_etag_only_page_304_without_last_modified(runs):
    """No Last-Modified at all: only the ETag can produce the 304."""
    store, _ = runs
    st = _statuses(store, "/etag-only.html")
    assert st[0][1] == 200 and all(s == 304 for _, s in st[1:])
    assert len(st) >= 2


def test_changed_etag_forces_refetch_despite_stale_lm(
    spark, etag_web, etag_web_v2, etag_config, tmp_path_factory
):
    """Round 1 stores rot-v1; the corpus revs to rot-v2 (Last-Modified
    still stale) — the next revisit must re-fetch (200), because the
    validator comparison is by ETag, not by timestamp."""
    store = StateStore(str(tmp_path_factory.mktemp("state_rot")), spark)
    seeds = spark.read.parquet(f"{etag_web}/seeds.parquet")
    robots = spark.read.parquet(f"{etag_web}/robots_src.parquet")
    job1 = CrawlJob(
        spark, store, etag_config,
        spark.read.parquet(f"{etag_web}/pages.parquet"), robots,
    )
    job1.run(seeds, 3)  # round 2: first child fetches; round 3: revisits
    rows = {
        (r["round"], r["url_canon"]): r["status"]
        for r in store.read_fetched(3).collect()
    }
    assert rows[(2, "http://e.test/rotating.html")] == 200  # first fetch
    assert rows[(3, "http://e.test/rotating.html")] == 304  # unchanged etag

    job2 = CrawlJob(
        spark, store, etag_config,
        spark.read.parquet(f"{etag_web_v2}/pages.parquet"), robots,
    )
    job2.run(seeds, 4)  # resumes: only round 4 runs against the new corpus
    rows4 = {
        r["url_canon"]: r["status"]
        for r in store.read_fetched(4).collect()
        if r["round"] == 4
    }
    assert rows4["http://e.test/rotating.html"] == 200  # etag changed
    assert rows4["http://e.test/etag-stale.html"] == 304  # etag unchanged
