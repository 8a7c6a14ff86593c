"""S7 conditional revisit (If-Modified-Since → 304) + F5 MIME filter parity.

Reference semantics ([R:src/http.cpp] conditional GET, [R:src/index.cpp]
Content-Type check): on revisit, a page whose Last-Modified is not newer
than the previous successful fetch answers 304 — no body, no re-parse, no
re-discovery, and the NEXT revisit keeps using the original fetch time.
A fetched page whose Content-Type is not indexable is stored as a fetch
(200) but contributes no text and no outlinks.

Engine and oracle must produce identical fetch sequences INCLUDING the 304
rows, under a Period short enough that every round revisits.
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

N_ROUNDS = 4
FUTURE = EPOCH_UNIX + 10 * 365 * 86400
PAST = EPOCH_UNIX - 30 * 86400


def _page(body: str) -> bytes:
    return f"<html><body>{body}</body></html>".encode()


@pytest.fixture(scope="module")
def revisit_web(tmp_path_factory):
    out = tmp_path_factory.mktemp("web_revisit")
    # (url, html, content_type, last_modified)
    rows = [
        (
            "http://a.test/",
            _page(
                'root <a href="/fresh.html">f</a> <a href="/stale.html">s</a> '
                '<a href="/binary.bin">b</a>'
            ),
            "text/html",
            FUTURE,  # root always re-fetches on revisit
        ),
        # always-modified page: every revisit is a fresh 200
        ("http://a.test/fresh.html", _page("fresh content"), "text/html", FUTURE),
        # stale page: first fetch 200, every revisit 304
        ("http://a.test/stale.html", _page('stale <a href="/late.html">l</a>'), "text/html", PAST),
        # F5: fetched but not indexable → no text, no outlinks followed
        (
            "http://a.test/binary.bin",
            b"\x89PNGfakebytes<a href=\"/never.html\">x</a>",
            "application/octet-stream",
            PAST,
        ),
        ("http://a.test/late.html", _page("found via stale"), "text/html", PAST),
        ("http://a.test/never.html", _page("must never be discovered"), "text/html", PAST),
    ]
    urls = [r[0] for r in rows]
    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * len(rows), pa.timestamp("us", tz="UTC")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([extract1(r[1]) for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "content_type": pa.array([r[2] for r in rows], pa.string()),
            "last_modified": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(out / "pages.parquet"))
    pq.write_table(
        pa.table(
            {
                "host": pa.array(["a.test"], pa.string()),
                "body": pa.array([b"User-agent: *\nDisallow:\n"], pa.binary()),
            }
        ),
        str(out / "robots_src.parquet"),
    )
    pq.write_table(
        pa.table({"url": pa.array(["http://a.test/"], pa.string())}),
        str(out / "seeds.parquet"),
    )
    return str(out)


@pytest.fixture(scope="module")
def revisit_config():
    # Period == round interval → every fetched URL is due again next round
    return CrawlConfig(
        period_s=3600,
        round_interval_s=3600,
        host_budget=8,
        bloom_partitions=4,
        bloom_bits_per_partition=1 << 14,
        bloom_num_hashes=5,
    )


@pytest.fixture(scope="module")
def runs(spark, revisit_web, revisit_config, tmp_path_factory):
    store = StateStore(str(tmp_path_factory.mktemp("state304")), spark)
    job = CrawlJob(
        spark,
        store,
        revisit_config,
        spark.read.parquet(f"{revisit_web}/pages.parquet"),
        spark.read.parquet(f"{revisit_web}/robots_src.parquet"),
    )
    job.run(spark.read.parquet(f"{revisit_web}/seeds.parquet"), N_ROUNDS)
    pages, robots_src, seeds = load_fixture_dicts(revisit_web)
    ora = crawl(pages, robots_src, seeds, revisit_config, N_ROUNDS)
    return store, ora


def test_fetch_order_with_304_matches_oracle(runs):
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
    statuses = {s for (_, _, _, _, s, _) in eng}
    assert 304 in statuses, "fixture must exercise the 304 path"


def test_stale_page_304_on_revisit_and_fresh_refetches(runs):
    store, _ = runs
    rows = sorted(
        (r["round"], r["url_canon"], r["status"])
        for r in store.read_fetched(N_ROUNDS).collect()
    )
    stale = [(rd, st) for rd, u, st in rows if u.endswith("/stale.html")]
    fresh = [(rd, st) for rd, u, st in rows if u.endswith("/fresh.html")]
    # first fetch 200, all revisits 304
    assert stale[0][1] == 200 and all(st == 304 for _, st in stale[1:])
    assert len(stale) >= 2
    # always-modified page re-fetches 200 every round
    assert all(st == 200 for _, st in fresh) and len(fresh) >= 2


def test_mime_filtered_page_fetched_but_not_indexed(runs):
    store, ora = runs
    rows = [
        r for r in store.read_fetched(N_ROUNDS).collect()
        if r["url_canon"].endswith("/binary.bin")
    ]
    assert rows, "binary page must be fetched"
    assert all(r["text"] is None and r["n_links"] == 0 for r in rows)
    # its embedded href is never discovered on either side
    eng_seen = {r["url_canon"] for r in store.read_seen(N_ROUNDS).collect()}
    assert "http://a.test/never.html" not in eng_seen
    assert "http://a.test/never.html" not in ora.seen
    # but the stale page's outlink WAS discovered on its first (200) fetch
    assert "http://a.test/late.html" in eng_seen
