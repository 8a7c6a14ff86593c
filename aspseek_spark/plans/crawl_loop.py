"""Multi-round resumable crawl loop (SURVEY.md §2.10, §3.1; BASELINE.json:6).

Each round is one micro-batch (run_round) whose outputs are committed as an
atomic snapshot (StateStore). The next round reads state back from the
committed snapshot — which both truncates lineage (the Spark plan never
grows across rounds) and makes resume trivial: a killed job restarts from
``manifest.json`` and, because round logic is a pure function of committed
state + round_id, replays to an identical frontier / seen set / fetch order
(resume test: tests/test_resume.py).

``CrawlJob.run_streaming`` exposes the same loop through Structured
Streaming's foreachBatch for parity with the north_star phrasing ("each
crawl round is a Structured-Streaming-style micro-batch"); the plain loop
is the default for deterministic ordering.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..sources.tables import StateStore
from .crawl_round import init_state, run_round


class CrawlJob:
    def __init__(
        self,
        spark: SparkSession,
        store: StateStore,
        config: CrawlConfig,
        pages: DataFrame,
        robots_src: DataFrame,
        fetcher=None,
    ):
        self.spark = spark
        self.store = store
        self.config = config
        self.pages = pages
        self.robots_src = robots_src
        self.fetcher = fetcher  # SRC2 seam: live connector or None=simulated

    def ensure_init(self, seeds: DataFrame) -> None:
        """Commit round-0 state (seed insertion) if nothing is committed."""
        if self.store.last_committed_round() is not None:
            return
        st = init_state(self.spark, seeds, self.config)
        self.store.write_round(
            0, self.config,
            frontier=st.frontier,
            bloom=st.bloom,
            seen_delta=st.seen_delta,
            robots_delta=st.robots_delta,
            fetched=None,
            metrics=None,
        )

    def run_one(self, round_id: int) -> dict:
        """Execute round ``round_id`` (state from round_id-1) and commit."""
        t0 = time.time()
        prev = round_id - 1
        frontier = self.store.read_frontier(prev)
        seen = self.store.read_seen(prev)
        bloom = self.store.read_bloom(prev)
        robots = self.store.read_robots(prev)

        res = run_round(
            self.spark, round_id, self.config,
            frontier, seen, bloom, robots, self.pages, self.robots_src,
            fetcher=self.fetcher,
        )

        import os

        timing = os.environ.get("ASPSEEK_TIMING") == "1"
        marks: list[tuple[str, float]] = [("plan", time.time() - t0)]

        def mark(label: str) -> None:
            if timing:
                marks.append((label, time.time() - t0))

        # Round-2 job structure (cuts the serial barrier floor ~2×):
        #   job A (inside run_round): scheduled.count — materializes the
        #     frontier-scan → robots → politeness-window chain and picks the
        #     fetch-join strategy from the measured batch size.
        #   job B: new_urls.count — materializes fetch join, parse, bloom
        #     probe and the seen backstop in one pass (their persists fill
        #     during this single action, so later broadcast builds collect
        #     cached blocks instead of re-running heavy work inside a
        #     broadcast-build job, where AQE may coalesce to one partition —
        #     observed 20s single-task builds in round 1).
        #   then ALL table writes run as concurrent jobs over cached data
        #     (the frontier write doubles as its materialization), and the
        #     remaining metrics counts are cheap cached-scan jobs.
        n_sched = res.n_sched  # materialized by run_round (job A)
        mark("scheduled.materialize")
        n_new = res.new_urls.count()
        mark("new_urls.materialize")
        res.frontier.persist()
        self.store.write_round(
            round_id, self.config,
            frontier=res.frontier,
            bloom=res.bloom,
            seen_delta=res.seen_delta,
            robots_delta=res.robots_delta,
            fetched=res.fetched,
            metrics=None,  # written below from cheap committed-state counts
            links=res.links,
            on_table_written=mark if timing else None,
        )
        # per-round lineage + metrics [B:14] — counts on persisted data
        frontier_size = res.frontier.count()  # cached by its write job
        mark("frontier.count")
        n_ok = res.fetched.filter(F.col("status") == 200).count()
        mark("n_ok.count")
        from ..operators.seen import bloom_metrics

        # distributed: per-blob fill ratios were computed next to the blobs
        # by bloom_add; this is a P-row scalar aggregate, no blob collect
        fill, bloom_keys = bloom_metrics(self.store.read_bloom(round_id))
        mark("bloom.metrics")
        if timing:
            deltas = [
                f"{label}+{t - prev:.1f}s"
                for (label, t), (_, prev) in zip(marks, [("", 0.0)] + marks[:-1])
            ]
            print(f"[round {round_id} timing] " + " ".join(deltas), flush=True)
        elapsed = time.time() - t0
        metrics = {
            "round": round_id,
            "urls_scheduled": n_sched,
            "urls_fetched_ok": n_ok,
            "new_urls": n_new,
            "frontier_size": frontier_size,
            "bloom_fill": fill,
            "bloom_keys": bloom_keys,
            "elapsed_s": elapsed,
        }
        self.spark.createDataFrame([Row(**metrics)]).write.mode(
            "overwrite"
        ).parquet(self.store._p("metrics", round_id))
        for df in res.persisted or []:
            df.unpersist()
        res.frontier.unpersist()
        # drop the py-side references to this round's localCheckpoint RDDs
        # so the ContextCleaner frees their blocks before the next round's
        # text lands (bounded memory across arbitrarily many rounds)
        del res
        import gc

        gc.collect()
        return metrics

    def run(self, seeds: DataFrame, n_rounds: int) -> list[dict]:
        """Resume-aware: picks up after the last committed round."""
        self.ensure_init(seeds)
        start = self.store.last_committed_round() + 1
        out = []
        for r in range(start, n_rounds + 1):
            out.append(self.run_one(r))
        return out

    def run_streaming(self, seeds: DataFrame, n_rounds: int) -> list[dict]:
        """Structured-Streaming face of the loop: a rate-source tick stream
        drives foreachBatch, each batch executing exactly one committed
        crawl round. Functionally identical to ``run`` (and uses the same
        snapshot commit), provided for API parity with streaming deploys
        where a scheduler tick (e.g. Kafka control topic) triggers rounds.
        """
        self.ensure_init(seeds)
        metrics: list[dict] = []

        def _batch(_df, _epoch: int) -> None:
            nxt = self.store.last_committed_round() + 1
            if nxt <= n_rounds:
                metrics.append(self.run_one(nxt))

        stream = (
            self.spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
        )
        q = stream.writeStream.foreachBatch(_batch).trigger(
            processingTime="0 seconds"
        ).start()
        try:
            while self.store.last_committed_round() < n_rounds:
                time.sleep(0.2)
        finally:
            q.stop()
        return metrics
