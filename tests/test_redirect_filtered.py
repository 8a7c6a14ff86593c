"""Engine/oracle parity for redirects whose target is dropped (F1/F2 + J4).

Round-1 advice found a latent divergence: a meta-refresh page whose target
is config-denied (or unresolvable) must still fetch as status 302 — the
redirect-ness of the PAGE is independent of whether the TARGET survives the
filter chain. The engine now carries an explicit is_redirect flag; this web
is built so that divergence would flip a status and change the seen set.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aspseek_spark.config import CrawlConfig, FilterRule
from aspseek_spark.functions.textextract import extract1
from aspseek_spark.oracle.model_crawler import crawl, load_fixture_dicts
from aspseek_spark.plans.crawl_loop import CrawlJob
from aspseek_spark.sources.tables import StateStore

N_ROUNDS = 3


def _page(body_html: str) -> bytes:
    return f"<html><body>{body_html}</body></html>".encode()


def _redirect_page(target: str) -> bytes:
    return (
        f'<html><head><meta http-equiv="refresh" content="0;url={target}">'
        f"</head><body>moved</body></html>"
    ).encode()


@pytest.fixture(scope="module")
def redirect_web(tmp_path_factory):
    out = tmp_path_factory.mktemp("web_redirect")
    pages = {
        "http://a.test/": _page(
            'start <a href="/redir.html">r</a> <a href="/redir2.html">r2</a> '
            '<a href="/ok.html">ok</a>'
        ),
        # redirect to a config-DENIED target: must still fetch as 302,
        # target must never enter the frontier
        "http://a.test/redir.html": _redirect_page("http://a.test/denied/x.html"),
        # redirect to an allowed target: followed at parent depth
        "http://a.test/redir2.html": _redirect_page("http://a.test/ok2.html"),
        "http://a.test/ok.html": _page("plain page one two three"),
        "http://a.test/ok2.html": _page("redirect target lives"),
        "http://a.test/denied/x.html": _page("should never be fetched"),
    }
    urls = list(pages)
    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * len(urls), pa.timestamp("us", tz="UTC")),
            "html": pa.array([pages[u] for u in urls], pa.binary()),
            "text": pa.array([extract1(pages[u]) for u in urls], pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
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
def filtered_config():
    return CrawlConfig(
        max_hops=3,
        host_budget=8,
        bloom_partitions=4,
        bloom_bits_per_partition=1 << 14,
        bloom_num_hashes=5,
        filters=(
            FilterRule(allow=False, kind="prefix", pattern="http://a.test/denied"),
        ),
    )


def test_filtered_redirect_parity(spark, redirect_web, filtered_config, tmp_path):
    store = StateStore(str(tmp_path / "state"), spark)
    job = CrawlJob(
        spark,
        store,
        filtered_config,
        spark.read.parquet(f"{redirect_web}/pages.parquet"),
        spark.read.parquet(f"{redirect_web}/robots_src.parquet"),
    )
    job.run(spark.read.parquet(f"{redirect_web}/seeds.parquet"), N_ROUNDS)

    pages, robots_src, seeds = load_fixture_dicts(redirect_web)
    ora = crawl(pages, robots_src, seeds, filtered_config, N_ROUNDS)

    eng = sorted(
        (
            (r["round"], r["sched_unix"], r["host"], r["url_canon"], r["status"])
            for r in store.read_fetched(N_ROUNDS).collect()
        )
    )
    exp = sorted(
        (f.round, f.sched_unix, f.host, f.url_canon, f.status)
        for f in ora.fetches
    )
    assert eng == exp
    # the denied-target redirect page itself was fetched, as a 302
    redir = [e for e in eng if e[3] == "http://a.test/redir.html"]
    assert redir and redir[0][4] == 302
    # the denied target never entered seen/frontier on either side
    eng_seen = {
        r["url_canon"] for r in store.read_seen(N_ROUNDS).collect()
    }
    assert eng_seen == ora.seen
    assert "http://a.test/denied/x.html" not in eng_seen
    # the allowed redirect WAS followed (at parent depth)
    assert "http://a.test/ok2.html" in eng_seen
