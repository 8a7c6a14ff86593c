from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

from aspseek_spark.config import CrawlConfig
from aspseek_spark.sources.webgen import WebSpec, write_web

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("aspseek_spark_tests")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_web(tmp_path_factory):
    """~400-page deterministic web — shared across crawl tests."""
    out = str(tmp_path_factory.mktemp("web_tiny"))
    write_web(out, WebSpec(n_pages=400, seed=42))
    return out


@pytest.fixture(scope="session")
def test_config():
    return CrawlConfig(
        max_hops=3,
        delta_time_s=2,
        period_s=7 * 24 * 3600,
        host_budget=4,
        round_interval_s=3600,
        bloom_partitions=8,
        bloom_bits_per_partition=1 << 16,
        bloom_num_hashes=5,
    )
