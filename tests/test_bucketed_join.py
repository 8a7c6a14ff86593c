"""The 100 TB fetch-join path: pages as a BUCKETED table (SURVEY.md §4, J3).

At the design point the crawl batch can exceed any broadcast threshold; the
scale-safe join stores ``pages`` bucketed by url_canon so the join is
bucket-local — Spark shuffles ONLY the batch side into the bucket layout,
and the multi-TB pages side is scanned in place (no Exchange above its
scan). This test proves that property from the physical plan, not prose.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_pages(spark, tiny_web, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("warehouse") / "pages_bucketed")
    pages = spark.read.parquet(f"{tiny_web}/pages.parquet").select(
        F.col("url").alias("url_canon"), "html"
    )
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")
    (
        pages.write.bucketBy(N_BUCKETS, "url_canon")
        .sortBy("url_canon")
        .option("path", path)
        .saveAsTable("pages_bucketed")
    )
    yield spark.table("pages_bucketed")
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")


def _plan_of(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_fetch_join_does_not_shuffle_pages(spark, bucketed_pages, tiny_web):
    batch = (
        spark.read.parquet(f"{tiny_web}/seeds.parquet")
        .select(F.col("url").alias("url_canon"))
        .withColumn("depth", F.lit(0))
    )
    # disable broadcast so the join planner must use the bucket layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_pages.join(batch, on="url_canon", how="inner")
        plan = _plan_of(joined)
        # the pages side scans its buckets in place...
        assert "Bucketed: true" in plan, plan
        # ...and every Exchange in the plan is on the batch side: the scan
        # of pages_bucketed must not sit under any Exchange. The formatted
        # plan lists one Exchange (batch side) for a bucketed SMJ/SHJ.
        n_exchanges = plan.count("Exchange")
        assert n_exchanges <= 2, plan  # batch shuffle (+AQE reuse at most)
        # correctness of the join itself
        n = joined.count()
        assert n == batch.join(
            spark.read.parquet(f"{tiny_web}/pages.parquet").select(
                F.col("url").alias("url_canon")
            ),
            "url_canon",
        ).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_scan_reports_bucket_pruning(spark, bucketed_pages):
    # probing a single url prunes to one bucket (SelectedBucketsCount).
    # autoBucketedScan skips the bucketed layout when it sees no join/agg
    # benefit — disable it so the point-probe pruning path is exercised.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        one = bucketed_pages.filter(
            F.col("url_canon") == "http://h0000.test/"
        )
        plan = _plan_of(one)
        assert "SelectedBucketsCount: 1 out of" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
