"""robots.txt parse + longest-match decision tests (SURVEY.md F4/SRC3)."""

from __future__ import annotations

from aspseek_spark.functions.robots import parse_robots, path_of, robots_allowed

BODY = (
    b"# comment\n"
    b"User-agent: repo-bot\n"
    b"Disallow: /private/\n"
    b"Allow: /private/open/\n"
    b"\n"
    b"User-agent: *\n"
    b"Disallow: /dir2/\n"
)


def test_group_selection_specific_ua():
    rules = parse_robots(BODY, "repo-bot")
    assert rules == [(False, "/private/"), (True, "/private/open/")]


def test_group_selection_star_fallback():
    rules = parse_robots(BODY, "otherbot")
    assert rules == [(False, "/dir2/")]


def test_longest_match_allow_wins_tie():
    rules = [(False, "/a/"), (True, "/a/b/"), (False, "/a/b/"), (True, "/")]
    assert robots_allowed(rules, "/a/x") is False
    assert robots_allowed(rules, "/a/b/x") is True  # allow wins length tie
    assert robots_allowed(rules, "/c") is True


def test_empty_disallow_means_allow_all():
    assert parse_robots(b"User-agent: *\nDisallow:\n", "repo-bot") == []
    assert robots_allowed([], "/anything") is True
    assert robots_allowed(None, "/anything") is True


def test_disallow_all():
    rules = parse_robots(b"User-agent: *\nDisallow: /\n", "repo-bot")
    assert robots_allowed(rules, "/") is False
    assert robots_allowed(rules, "/x/y") is False


def test_multi_ua_lines_share_group():
    body = b"User-agent: a\nUser-agent: repo-bot\nDisallow: /x/\n"
    assert parse_robots(body, "repo-bot") == [(False, "/x/")]


def test_longest_ua_substring_wins():
    body = (
        b"User-agent: repo\nDisallow: /short/\n\n"
        b"User-agent: repo-bot\nDisallow: /long/\n"
    )
    assert parse_robots(body, "repo-bot") == [(False, "/long/")]


def test_path_of():
    assert path_of("http://h.test/a/b?q=1") == "/a/b?q=1"
    assert path_of("http://h.test") == "/"


def test_allow_filter_newest_generation_wins(spark):
    """SRC3 TTL: re-fetches append new cache generations; the allow filter
    must use the NEWEST rules per host (both orderings checked)."""
    from aspseek_spark.operators.robots_join import (
        ROBOTS_SCHEMA,
        robots_allow_filter,
    )

    deny_all = [(False, "/")]
    allow_all = []
    cand = spark.createDataFrame(
        [("http://h.test/a.html", "h.test")], "url_canon string, host string"
    )
    # old generation denies, new allows → candidate passes
    cache1 = spark.createDataFrame(
        [("h.test", deny_all, None, 200, 100), ("h.test", allow_all, None, 200, 200)],
        ROBOTS_SCHEMA,
    )
    ok1 = robots_allow_filter(cand, cache1).collect()[0]["robots_ok"]
    assert ok1 is True
    # old generation allows, new denies → candidate blocked
    cache2 = spark.createDataFrame(
        [("h.test", allow_all, None, 200, 100), ("h.test", deny_all, None, 200, 200)],
        ROBOTS_SCHEMA,
    )
    ok2 = robots_allow_filter(cand, cache2).collect()[0]["robots_ok"]
    assert ok2 is False


def test_parse_robots_full_crawl_delay():
    """Crawl-delay parsing: same group selection as the allow rules, first
    valid value wins, fractional floors to whole seconds, garbage and
    negative values ignored."""
    from aspseek_spark.functions.robots import parse_robots_full

    body = (
        b"User-agent: *\nCrawl-delay: 10\nDisallow: /x/\n"
        b"User-agent: repo-bot\nCrawl-delay: 2.9\nDisallow: /y/\n"
    )
    rules, delay = parse_robots_full(body, "repo-bot")
    assert rules == [(False, "/y/")]
    assert delay == 2  # the UA-specific group's delay, floored
    rules, delay = parse_robots_full(body, "otherbot")
    assert (rules, delay) == ([(False, "/x/")], 10)
    # no delay line → None
    assert parse_robots_full(b"User-agent: *\nDisallow: /a/\n", "x")[1] is None
    # garbage / negative ignored; first VALID value wins
    body2 = (
        b"User-agent: *\nCrawl-delay: soon\nCrawl-delay: -3\n"
        b"Crawl-delay: 4\nCrawl-delay: 1\n"
    )
    assert parse_robots_full(body2, "x")[1] == 4
    # a Crawl-delay line ends the user-agent list (group directive)
    body3 = (
        b"User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /z/\n"
    )
    assert parse_robots_full(body3, "a-bot")[1] == 5
    assert parse_robots_full(body3, "b-bot") == ([(False, "/z/")], None)


def test_parse_robots_hostile_crawl_delay_values():
    """Round-4 ADVICE: 'inf'/'1e999' overflow int(float(...)), 'nan' raises
    ValueError — none may crash the parse (engine pandas-UDF or oracle);
    finite values past 2^31-1 clamp so the engine's IntegerType robots
    column cannot wrap (sched parity engine↔oracle on hostile input)."""
    from aspseek_spark.functions.robots import parse_robots_full

    for bad in (b"inf", b"-inf", b"1e999", b"nan", b"-1e999"):
        body = b"User-agent: *\nCrawl-delay: " + bad + b"\nDisallow: /x/\n"
        rules, delay = parse_robots_full(body, "x")
        assert rules == [(False, "/x/")]
        assert delay is None, bad
    # finite-but-huge clamps to 2^31-1 (still capped downstream by
    # config.crawl_delay_cap_s before any sched arithmetic)
    body = b"User-agent: *\nCrawl-delay: 9999999999\n"
    assert parse_robots_full(body, "x")[1] == 2**31 - 1
    # first VALID value still wins after hostile lines
    body2 = b"User-agent: *\nCrawl-delay: inf\nCrawl-delay: 6\n"
    assert parse_robots_full(body2, "x")[1] == 6


def test_crawl_delay_spacing_crawl_parity(
    spark, tiny_web, test_config, tmp_path_factory
):
    """Crawl-delay end to end: hosts advertising a delay get THEIR spacing
    (capped), others keep delta_time_s; fetch order and sched times match
    the oracle exactly (shared parse + shared precedence)."""
    import dataclasses

    import pyarrow.parquet as pq

    from aspseek_spark.oracle.model_crawler import crawl, load_fixture_dicts
    from aspseek_spark.plans.crawl_loop import CrawlJob
    from aspseek_spark.sources.tables import StateStore

    cfg = dataclasses.replace(test_config, crawl_delay_cap_s=10)
    t = pq.read_table(f"{tiny_web}/robots_src.parquet").to_pydict()
    hosts = sorted(t["host"])
    # pick delay hosts that actually get ≥2 same-round fetches (so spacing
    # is observable) — probe with the pure-Python oracle on the original web
    pages0, orig_src, seeds0 = load_fixture_dicts(tiny_web)
    probe = crawl(pages0, orig_src, seeds0, test_config, 3)
    from collections import Counter

    per_round: Counter = Counter()
    for f in probe.fetches:
        per_round[(f.round, f.host)] += 1
    multi = sorted({h for (_r, h), c in per_round.items() if c >= 2})
    assert len(multi) >= 3, multi
    slow_host, greedy_host = multi[0], multi[1]
    new_src = {}
    for h, b in zip(t["host"], t["body"]):
        if h == slow_host:
            new_src[h] = b"User-agent: *\nCrawl-delay: 7\n"
        elif h == greedy_host:
            # hostile delay must be capped at crawl_delay_cap_s
            new_src[h] = b"User-agent: *\nCrawl-delay: 9999\n"
        else:
            new_src[h] = bytes(b) if b is not None else None
    robots_df = spark.createDataFrame(
        [(h, b) for h, b in new_src.items()], "host string, body binary"
    )

    n_rounds = 3
    store = StateStore(str(tmp_path_factory.mktemp("state_cdelay")), spark)
    job = CrawlJob(
        spark, store, cfg,
        spark.read.parquet(f"{tiny_web}/pages.parquet"),
        robots_df,
    )
    job.run(spark.read.parquet(f"{tiny_web}/seeds.parquet"), n_rounds)
    ora = crawl(pages0, new_src, seeds0, cfg, n_rounds)

    eng = sorted(
        (r["round"], r["sched_unix"], r["host"], r["url_canon"], r["status"])
        for r in store.read_fetched(n_rounds).collect()
    )
    exp = sorted(
        (f.round, f.sched_unix, f.host, f.url_canon, f.status)
        for f in ora.fetches
    )
    assert eng == exp

    # spacing assertions on the engine output
    def spacings(host):
        out = []
        byround: dict[int, list[int]] = {}
        for rnd, sched, h, _u, _s in eng:
            if h == host:
                byround.setdefault(rnd, []).append(sched)
        for scheds in byround.values():
            scheds.sort()
            out += [b - a for a, b in zip(scheds, scheds[1:])]
        return out

    slow = spacings(slow_host)
    assert slow and set(slow) == {7}, (slow_host, slow)
    greedy = spacings(greedy_host)
    assert greedy and set(greedy) == {10}, (greedy_host, greedy)  # capped
    normal = [
        s
        for h in hosts
        if h not in (slow_host, greedy_host)
        for s in spacings(h)
    ]
    assert normal and set(normal) == {cfg.delta_time_s}

    # honor_crawl_delay=False restores plain DeltaTime everywhere
    cfg_off = dataclasses.replace(cfg, honor_crawl_delay=False)
    store2 = StateStore(str(tmp_path_factory.mktemp("state_cdoff")), spark)
    job2 = CrawlJob(
        spark, store2, cfg_off,
        spark.read.parquet(f"{tiny_web}/pages.parquet"),
        robots_df,
    )
    job2.run(spark.read.parquet(f"{tiny_web}/seeds.parquet"), 2)
    ora2 = crawl(pages0, new_src, seeds0, cfg_off, 2)
    eng2 = sorted(
        (r["round"], r["sched_unix"], r["host"], r["url_canon"], r["status"])
        for r in store2.read_fetched(2).collect()
    )
    assert eng2 == sorted(
        (f.round, f.sched_unix, f.host, f.url_canon, f.status)
        for f in ora2.fetches
    )


def test_robots_ttl_refetch_crawl_parity(
    spark, tiny_web, test_config, tmp_path_factory
):
    """With robots_period_s = one round interval, every revisited host
    re-fetches robots each round; fetch order must still match the oracle
    (static robots bodies → same rules), and the committed robots cache
    must show multiple generations for re-fetched hosts."""
    import dataclasses

    from aspseek_spark.oracle.model_crawler import crawl, load_fixture_dicts
    from aspseek_spark.plans.crawl_loop import CrawlJob
    from aspseek_spark.sources.tables import StateStore

    cfg = dataclasses.replace(test_config, robots_period_s=3600)
    n_rounds = 3
    store = StateStore(str(tmp_path_factory.mktemp("state_rttl")), spark)
    job = CrawlJob(
        spark, store, cfg,
        spark.read.parquet(f"{tiny_web}/pages.parquet"),
        spark.read.parquet(f"{tiny_web}/robots_src.parquet"),
    )
    job.run(spark.read.parquet(f"{tiny_web}/seeds.parquet"), n_rounds)
    pages, robots_src, seeds = load_fixture_dicts(tiny_web)
    ora = crawl(pages, robots_src, seeds, cfg, n_rounds)

    eng = sorted(
        (r["round"], r["sched_unix"], r["host"], r["url_canon"], r["status"])
        for r in store.read_fetched(n_rounds).collect()
    )
    exp = sorted(
        (f.round, f.sched_unix, f.host, f.url_canon, f.status)
        for f in ora.fetches
    )
    assert eng == exp
    # hosts due in multiple rounds re-fetched robots: >1 cache generation
    from pyspark.sql import functions as F

    gens = (
        store.read_robots(n_rounds)
        .groupBy("host")
        .agg(F.count("*").alias("n"), F.countDistinct("fetched_unix").alias("d"))
        .filter(F.col("n") > 1)
        .collect()
    )
    assert gens, "TTL must force at least one robots re-fetch"
    assert all(r["n"] == r["d"] for r in gens)  # one generation per round
