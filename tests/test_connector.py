"""SRC2 seam proof: the mapInPandas connector replaces the simulated fetch
join with IDENTICAL crawl behavior (fetch order, statuses, text, seen set).
"""

from __future__ import annotations

import pytest

from aspseek_spark.oracle.model_crawler import crawl, load_fixture_dicts
from aspseek_spark.plans.crawl_loop import CrawlJob
from aspseek_spark.sources.connector import (
    MockTransport,
    connector_fetcher,
    corpus_from_pages,
)
from aspseek_spark.sources.tables import StateStore

N_ROUNDS = 3


@pytest.fixture(scope="module")
def connector_run(spark, tiny_web, test_config, tmp_path_factory):
    store = StateStore(str(tmp_path_factory.mktemp("state_conn")), spark)
    transport = MockTransport(corpus_from_pages(f"{tiny_web}/pages.parquet"))
    job = CrawlJob(
        spark,
        store,
        test_config,
        pages=spark.read.parquet(f"{tiny_web}/pages.parquet"),
        robots_src=spark.read.parquet(f"{tiny_web}/robots_src.parquet"),
        fetcher=connector_fetcher(transport, test_config),
    )
    job.run(spark.read.parquet(f"{tiny_web}/seeds.parquet"), N_ROUNDS)
    return store


def test_connector_matches_oracle(connector_run, tiny_web, test_config):
    pages, robots_src, seeds = load_fixture_dicts(tiny_web)
    ora = crawl(pages, robots_src, seeds, test_config, N_ROUNDS)
    eng = sorted(
        (
            r["round"], r["sched_unix"], r["host"], r["url_canon"],
            r["status"], r["text"],
        )
        for r in connector_run.read_fetched(N_ROUNDS).collect()
    )
    exp = sorted(
        (f.round, f.sched_unix, f.host, f.url_canon, f.status, f.text)
        for f in ora.fetches
    )
    assert len(eng) == len(exp) > 20
    assert eng == exp
    eng_seen = {
        r["url_canon"] for r in connector_run.read_seen(N_ROUNDS).collect()
    }
    assert eng_seen == ora.seen
