"""North-rule correctness gate (SURVEY.md §5.2, BASELINE.json:6):

engine (Spark micro-batch loop) vs oracle (pure-Python model crawler) on the
same deterministic synthetic web must produce:
  - identical fetch sequence: (round, sched_unix, host, url_canon, status)
  - identical final URL-seen set
  - byte-identical extracted text per fetched URL (vs oracle AND vs the
    golden ``pages.text`` column)
  - politeness invariants: per-host ≤ budget per round, DeltaTime spacing
  - MaxHops never exceeded
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aspseek_spark.oracle.model_crawler import crawl, load_fixture_dicts
from aspseek_spark.plans.crawl_loop import CrawlJob
from aspseek_spark.sources.tables import StateStore

N_ROUNDS = 4


@pytest.fixture(scope="module")
def engine_run(spark, tiny_web, test_config, tmp_path_factory):
    store = StateStore(str(tmp_path_factory.mktemp("state")), spark)
    pages = spark.read.parquet(f"{tiny_web}/pages.parquet")
    robots_src = spark.read.parquet(f"{tiny_web}/robots_src.parquet")
    seeds = spark.read.parquet(f"{tiny_web}/seeds.parquet")
    job = CrawlJob(spark, store, test_config, pages, robots_src)
    job.run(seeds, N_ROUNDS)
    return store


@pytest.fixture(scope="module")
def oracle_run(tiny_web, test_config):
    pages, robots_src, seeds = load_fixture_dicts(tiny_web)
    return crawl(pages, robots_src, seeds, test_config, N_ROUNDS)


def _engine_fetches(store):
    df = store.read_fetched(N_ROUNDS)
    rows = df.select(
        "round", "sched_unix", "host", "url_canon", "status", "seq_in_host",
        "text", "title", "depth",
    ).collect()
    return sorted(rows, key=lambda r: (r["round"], r["sched_unix"], r["host"], r["url_canon"]))


def test_fetch_order_matches_oracle(engine_run, oracle_run):
    eng = _engine_fetches(engine_run)
    ora = sorted(
        oracle_run.fetches,
        key=lambda f: (f.round, f.sched_unix, f.host, f.url_canon),
    )
    assert len(eng) >= 40, "crawl did not progress"
    assert len(eng) == len(ora)
    for e, o in zip(eng, ora):
        assert (
            e["round"], e["sched_unix"], e["host"], e["url_canon"],
            e["status"], e["seq_in_host"],
        ) == (o.round, o.sched_unix, o.host, o.url_canon, o.status, o.seq_in_host)


def test_seen_set_matches_oracle(engine_run, oracle_run):
    eng_seen = {
        r["url_canon"]
        for r in engine_run.read_seen(N_ROUNDS).select("url_canon").collect()
    }
    assert eng_seen == oracle_run.seen


def test_text_byte_identical(engine_run, oracle_run, tiny_web, spark):
    eng = {r["url_canon"]: r["text"] for r in _engine_fetches(engine_run)}
    for f in oracle_run.fetches:
        assert eng[f.url_canon] == f.text
    # and vs the golden column stored at generation time
    golden = dict(
        spark.read.parquet(f"{tiny_web}/pages.parquet")
        .select("url", "text")
        .collect()
    )
    checked = 0
    for url, text in eng.items():
        if url in golden and text is not None:
            assert text == golden[url]
            checked += 1
    assert checked >= 30


def test_title_matches_oracle(engine_run, oracle_run):
    """W4 title zone source: the engine's per-URL <title> text (parser
    extract_title, same charset rules as the body) equals the oracle's;
    non-parsed rows (404/304/302/MIME-filtered) carry None in both. The
    fixture web writes real <title> tags, so real titles are checked."""
    eng = {
        (r["round"], r["url_canon"]): r["title"]
        for r in _engine_fetches(engine_run)
    }
    non_empty = 0
    for f in oracle_run.fetches:
        assert eng[(f.round, f.url_canon)] == f.title, f.url_canon
        if f.title:
            non_empty += 1
    assert non_empty >= 20, "fixture titles should be non-trivial"


def test_politeness_invariants(engine_run, test_config):
    df = engine_run.read_fetched(N_ROUNDS)
    per_host = (
        df.groupBy("round", "host")
        .agg(F.count("*").alias("n"), F.collect_list("sched_unix").alias("ts"))
        .collect()
    )
    for r in per_host:
        assert r["n"] <= test_config.host_budget
        ts = sorted(r["ts"])
        for a, b in zip(ts, ts[1:]):
            assert b - a >= test_config.delta_time_s


def test_max_hops_never_exceeded(engine_run, test_config):
    mx = engine_run.read_fetched(N_ROUNDS).agg(F.max("depth")).collect()[0][0]
    assert mx <= test_config.max_hops


def test_redirects_followed_without_hop_cost(engine_run, oracle_run):
    """J4: 302 rows exist, match the oracle, and contribute no text."""
    eng = _engine_fetches(engine_run)
    eng302 = [e for e in eng if e["status"] == 302]
    ora302 = [f for f in oracle_run.fetches if f.status == 302]
    assert len(eng302) == len(ora302) > 0, "fixture should contain redirects"
    assert all(e["text"] is None for e in eng302)


def test_link_graph_written(engine_run):
    """D5/J6: the crawl emits its link graph for `index -R` rank."""
    links = engine_run.read_links(N_ROUNDS)
    n = links.count()
    assert n > 50
    assert links.columns == ["src_hash64", "dst_hash64", "round"]
    # every src is a fetched page
    fetched_hashes = engine_run.read_fetched(N_ROUNDS).select(
        F.col("url_hash64").alias("src_hash64")
    )
    orphans = links.select("src_hash64").distinct().join(
        fetched_hashes.distinct(), "src_hash64", "left_anti"
    )
    assert orphans.count() == 0


def test_crawl_rank_runs(engine_run):
    """A5 `index -R` over the crawl's own link graph."""
    from aspseek_spark.operators.rank import crawl_link_rank

    ranks = crawl_link_rank(
        engine_run.read_links(N_ROUNDS).select("src_hash64", "dst_hash64")
    )
    rows = ranks.collect()
    assert len(rows) > 50
    total = sum(r["rank"] for r in rows)
    assert abs(total - len(rows)) / len(rows) < 0.1  # mass ≈ conserved


def test_seen_monotone_and_frontier_subset(engine_run):
    seen = engine_run.read_seen(N_ROUNDS)
    assert seen.count() == seen.select("url_canon").distinct().count()
    frontier = engine_run.read_frontier(N_ROUNDS).select("url_canon")
    missing = frontier.join(seen, "url_canon", "left_anti").count()
    assert missing == 0  # every frontier URL is in the seen set
