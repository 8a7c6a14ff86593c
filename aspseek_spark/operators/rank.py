"""PageRank-style popularity rank — the `index -R` analog (SURVEY.md A5).

Reference: single-threaded pass over the stored citation graph computing a
popularity score per URL ([R:src/ranks.cpp]). Re-expressed as the classic
iterative DataFrame loop: contributions = rank/out_degree flowing over
edges, damping 0.85, dangling mass redistributed uniformly.
``localCheckpoint()`` per iteration truncates lineage so the plan stays
O(1) deep regardless of iteration count (SURVEY.md §3.2).

Scale notes: each iteration is one shuffle on dst (the groupBy) plus one
join on src; pre-partitioning ``links`` by src and caching it means the
join side never re-shuffles. Convergence at web scale typically ~20-50
iterations; the loop exits early on an L1-delta threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    links: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    tol: float | None = None,
) -> DataFrame:
    """links(src, dst) → (node, rank); ranks sum to n_nodes (classic PR)."""
    edges = links.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    edges_deg = edges.join(out_deg, "src").persist()
    edges_deg.count()

    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(n_iter):
        contribs = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        # dangling mass (rank held by nodes with no outlinks, spread evenly)
        # as a 1-row broadcast folded into the SAME job — no driver-side
        # scalar collect per iteration (one action per iteration: the
        # checkpoint below)
        dangling_df = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("dangling") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()  # truncate lineage every iteration
        )
        if tol is not None:
            delta = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "node")
                .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol * n_nodes:
                break
        else:
            ranks = new_ranks
    nodes.unpersist()
    edges_deg.unpersist()
    return ranks


def crawl_link_rank(fetched_links: DataFrame) -> DataFrame:
    """Rank over the crawl's link table (src_hash64, dst_hash64)."""
    return pagerank(fetched_links, src="src_hash64", dst="dst_hash64")
