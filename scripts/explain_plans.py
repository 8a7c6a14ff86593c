"""Physical-plan inspection for the crawl round's key operators
(SURVEY.md §4: verify pushdown / broadcast / no stray shuffles).

Run: python scripts/explain_plans.py
Greps each plan for the properties the design promises and prints
PASS/FAIL per check plus the formatted plans (to .cache/plans.txt).
"""

from __future__ import annotations

import io
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, plan: str, must: list[str], must_not: list[str]) -> bool:
    ok = True
    for s in must:
        if s.lower() not in plan.lower():
            print(f"FAIL {name}: expected '{s}' in plan")
            ok = False
    for s in must_not:
        if s.lower() in plan.lower():
            print(f"FAIL {name}: did NOT expect '{s}' in plan")
            ok = False
    if ok:
        print(f"PASS {name}")
    return ok


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from aspseek_spark.config import CrawlConfig
    from aspseek_spark.plans.crawl_round import init_state, run_round
    from aspseek_spark.sources.webgen import WebSpec, write_web

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    web = tempfile.mkdtemp()
    write_web(web, WebSpec(n_pages=300, seed=42))
    pages = spark.read.parquet(f"{web}/pages.parquet")
    robots_src = spark.read.parquet(f"{web}/robots_src.parquet")
    seeds = spark.read.parquet(f"{web}/seeds.parquet")
    cfg = CrawlConfig(bloom_partitions=4, bloom_bits_per_partition=1 << 14)

    st = init_state(spark, seeds, cfg)
    frontier = st.frontier.localCheckpoint()
    seen = st.seen_delta.localCheckpoint()
    bloom = st.bloom.localCheckpoint()
    from aspseek_spark.operators.robots_join import empty_robots

    res = run_round(
        spark, 1, cfg, frontier, seen, bloom, empty_robots(spark),
        pages, robots_src,
    )

    all_ok = True
    plans = {}

    # 1. frontier due-scan predicate pushes to the parquet read
    due_scan = spark.read.parquet(f"{web}/pages.parquet").filter(
        F.col("lang") == "en"
    ).select("url", "lang")
    p = plan_of(due_scan)
    plans["pushdown"] = p
    all_ok &= check(
        "parquet pushdown + pruning", p,
        must=["PushedFilters", "ReadSchema: struct<url:string,lang:string>"],
        must_not=["html"],
    )

    # 2. fetch join: pages side must NOT shuffle; scheduled side broadcast
    p = plan_of(res.fetched)
    plans["fetched"] = p
    all_ok &= check(
        "fetch join broadcasts scheduled batch", p,
        must=["BroadcastHashJoin"],
        must_not=[],
    )

    # 3. whole-stage codegen present in the scheduling path (formatted
    # explain marks codegen'd nodes with "[codegen id : N]")
    all_ok &= check(
        "codegen spans", p, must=["codegen id"], must_not=[]
    )

    # 4. seen test: exact backstop must be broadcast, not sort-merge
    p = plan_of(res.seen_delta)
    plans["seen_delta"] = p
    all_ok &= check(
        "seen backstop broadcast (no SMJ on seen)", p,
        must=["BroadcastHashJoin"], must_not=["SortMergeJoin"],
    )

    # 5. politeness windows partition by host(+salt), no global sort
    p = plan_of(res.frontier)
    plans["frontier"] = p
    all_ok &= check(
        "politeness window partitioned (no single-partition sort)", p,
        must=["Window"], must_not=["rangepartitioning(priority"],
    )

    with open("/root/repo/.cache/plans.txt", "w") as f:
        for k, v in plans.items():
            f.write(f"===== {k} =====\n{v}\n")
    print("plans written to .cache/plans.txt")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    import os

    os.makedirs("/root/repo/.cache", exist_ok=True)
    main()
