"""Crawl state tables with atomic snapshot commit (SURVEY.md §2.10, SNK1).

The reference keeps all durable crawl state in transactional MySQL tables
([R:src/sqldb.cpp]); the north_star replaces them with Iceberg frontier /
seen / fetched tables whose snapshots make a killed job resume with an
identical frontier (BASELINE.json:6,14). This image has no Iceberg jars
(SURVEY.md §7 hard-part 5), so snapshot isolation is emulated with the same
commit protocol Iceberg uses underneath: write immutable data files, then
atomically publish a manifest (os.replace on manifest.json). A round is
visible iff the manifest references it; partially-written rounds are
invisible and simply overwritten on retry — combined with fully
deterministic round logic this gives exactly-once-equivalent resume.

Table layouts (all parquet, explicit schemas — FIXTURES.md):

  frontier/round=N/     snapshot per round (the working set; rewritten)
  bloom/round=N/        snapshot per round (P blob rows; tiny)
  seen_delta/round=N/   append-only — only NEW urls each round, so per-round
                        write cost is O(new), not O(total); the logical
                        ``seen`` table is the union of deltas 0..N (at real
                        scale: an Iceberg append per round)
  robots_delta/round=N/ append-only robots-cache additions
  fetched/round=N/      append-only crawl output (+ extracted text)
  metrics/round=N/      append-only per-round lineage + metrics [B:14]

Use ``use_iceberg=True`` to route through a real Iceberg catalog when jars
are present (feature-flag seam; raises cleanly here).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..config import CrawlConfig

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("url_hash64", T.LongType()),
        T.StructField("hash32", T.IntegerType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("next_fetch_unix", T.LongType()),
        T.StructField("round_added", T.IntegerType()),
        T.StructField("origin_hash64", T.LongType()),
        T.StructField("tag", T.IntegerType()),
        # S7: unix time of the last non-304 fetch (null = never fetched);
        # drives the If-Modified-Since conditional revisit
        T.StructField("last_fetch_unix", T.LongType()),
    ]
)
SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("url_hash64", T.LongType()),
        T.StructField("hash32", T.IntegerType()),
        T.StructField("round_added", T.IntegerType()),
    ]
)
BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.IntegerType()),
        T.StructField("bits", T.BinaryType()),
        T.StructField("n_keys", T.LongType()),
        # per-blob fill ratio, computed where the blob lives (bloom_add) so
        # metrics aggregate P scalars instead of collecting blobs
        T.StructField("fill_ratio", T.DoubleType()),
    ]
)


class StateStore:
    """Directory-backed snapshot store with atomic manifest publish."""

    def __init__(self, root: str, spark: SparkSession, use_iceberg: bool = False):
        if use_iceberg:
            raise NotImplementedError(
                "Iceberg jars not present in this image; parquet+manifest "
                "emulation active (same commit protocol)."
            )
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    # -- manifest -----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def last_committed_round(self) -> int | None:
        if not os.path.exists(self._manifest_path):
            return None
        with open(self._manifest_path) as f:
            return json.load(f)["last_round"]

    def load_config(self) -> CrawlConfig:
        with open(self._manifest_path) as f:
            return CrawlConfig.from_json(json.dumps(json.load(f)["config"]))

    def _publish(self, round_id: int, config: CrawlConfig) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"last_round": round_id, "config": json.loads(config.to_json())},
                f,
                sort_keys=True,
            )
        os.replace(tmp, self._manifest_path)  # the atomic commit point

    # -- paths --------------------------------------------------------------
    def _p(self, table: str, round_id: int) -> str:
        return os.path.join(self.root, table, f"round={round_id}")

    # -- writes (invisible until _publish) -----------------------------------
    def write_round(
        self,
        round_id: int,
        config: CrawlConfig,
        frontier: DataFrame,
        bloom: DataFrame,
        seen_delta: DataFrame,
        robots_delta: DataFrame,
        fetched: DataFrame | None,
        metrics: DataFrame | None,
        links: DataFrame | None = None,
        on_table_written=None,
    ) -> None:
        def _done(label: str) -> None:
            if on_table_written is not None:
                on_table_written(f"write.{label}")

        # The snapshot's six tables are independent once the shared upstream
        # lineage is materialized (the caller persists + counts it first), so
        # their write jobs are submitted CONCURRENTLY — Spark schedules
        # concurrent jobs fine, and overlapping the per-job fixed latencies
        # cuts the serial floor of a round by ~3×. The manifest publish
        # (the commit point) still happens strictly after every write.
        from concurrent.futures import ThreadPoolExecutor

        jobs: list[tuple[str, DataFrame]] = [
            ("frontier", frontier),
            ("bloom", bloom),
            ("seen_delta", seen_delta),
            ("robots_delta", robots_delta),
        ]
        if fetched is not None:
            jobs.append(("fetched", fetched))
        if links is not None:
            jobs.append(("links", links))

        def _write(item: tuple[str, DataFrame]) -> None:
            name, df = item
            df.write.mode("overwrite").parquet(self._p(name, round_id))
            _done(name)

        with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
            # list() re-raises any write failure before the manifest publish
            list(pool.map(_write, jobs))

        if metrics is not None:
            metrics.write.mode("overwrite").parquet(self._p("metrics", round_id))
        self._publish(round_id, config)
        # snapshot GC: keep last 2 frontier/bloom snapshots (time travel for
        # the resume test; Iceberg would call this expire_snapshots)
        for table in ("frontier", "bloom"):
            for old in range(round_id - 2, -1, -1):
                path = self._p(table, old)
                if os.path.exists(path):
                    shutil.rmtree(path)
                else:
                    break

    def delete_urls(self, round_id: int, urls: list[str], config) -> None:
        """URL expiry / tag deletion (north_star cuckoo-deletion use case;
        reference: DELETE from urlword): remove ``urls`` from the committed
        seen set, frontier, and probe-filter state at ``round_id`` so the
        crawl can re-discover and re-fetch them.

        Mechanics: the seen deltas up to round_id are consolidated (minus
        deletions) into round_id's delta and older delta dirs removed; the
        frontier snapshot is rewritten without the urls; the bloom blobs of
        ONLY the touched pids are rebuilt from the surviving seen rows
        (operators/seen.seen_delete) — bounded work. Deployments with
        frequent deletion swap the bloom for operators/cuckoo_seen (true
        O(1) deletes, no rebuild).
        """
        from ..operators.seen import seen_delete

        deletes = self.spark.createDataFrame(
            [(u,) for u in urls], "url_canon string"
        )
        new_seen = self.read_seen(round_id).join(
            deletes, "url_canon", "left_anti"
        ).localCheckpoint()
        new_frontier = self.read_frontier(round_id).join(
            deletes, "url_canon", "left_anti"
        ).localCheckpoint()
        new_bloom = seen_delete(
            new_seen, self.read_bloom(round_id), deletes, config
        ).localCheckpoint()
        new_seen.write.mode("overwrite").parquet(
            self._p("seen_delta", round_id)
        )
        for r in range(round_id):
            p = self._p("seen_delta", r)
            if os.path.exists(p):
                shutil.rmtree(p)
        new_frontier.write.mode("overwrite").parquet(
            self._p("frontier", round_id)
        )
        new_bloom.write.mode("overwrite").parquet(self._p("bloom", round_id))

    # -- reads (only committed rounds) ---------------------------------------
    def read_frontier(self, round_id: int) -> DataFrame:
        return self.spark.read.schema(FRONTIER_SCHEMA).parquet(
            self._p("frontier", round_id)
        )

    def read_bloom(self, round_id: int) -> DataFrame:
        return self.spark.read.schema(BLOOM_SCHEMA).parquet(
            self._p("bloom", round_id)
        )

    def _delta_paths(self, table: str, upto_round: int) -> list[str]:
        return [
            self._p(table, r)
            for r in range(upto_round + 1)
            if os.path.exists(self._p(table, r))
        ]

    def read_seen(self, upto_round: int) -> DataFrame:
        paths = self._delta_paths("seen_delta", upto_round)
        if not paths:
            return self.spark.createDataFrame([], SEEN_SCHEMA)
        return self.spark.read.schema(SEEN_SCHEMA).parquet(*paths)

    def read_robots(self, upto_round: int) -> DataFrame:
        from ..operators.robots_join import ROBOTS_SCHEMA, empty_robots

        paths = self._delta_paths("robots_delta", upto_round)
        if not paths:
            return empty_robots(self.spark)
        return self.spark.read.schema(ROBOTS_SCHEMA).parquet(*paths)

    def read_fetched(self, upto_round: int) -> DataFrame:
        paths = self._delta_paths("fetched", upto_round)
        if not paths:
            raise FileNotFoundError("no fetched output yet")
        return self.spark.read.parquet(*paths)

    def read_metrics(self, upto_round: int) -> DataFrame:
        paths = self._delta_paths("metrics", upto_round)
        return self.spark.read.parquet(*paths)

    def read_links(self, upto_round: int) -> DataFrame:
        """Crawl link graph (src_hash64, dst_hash64, round) — `index -R`
        input (SURVEY.md D5/J6/A5)."""
        paths = self._delta_paths("links", upto_round)
        if not paths:
            return self.spark.createDataFrame(
                [], "src_hash64 long, dst_hash64 long, round int"
            )
        return self.spark.read.parquet(*paths)
