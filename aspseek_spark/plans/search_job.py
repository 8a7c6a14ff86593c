"""SearchJob — the serving face over the STORED bucketed index (SURVEY.md
§2.3 J7/J8, §2.5 W4, SNK2; round-2 verdict fix #5).

The reference answers queries from its persisted posting files, never by
re-parsing the crawl ([R:src/search.cpp] over [R:src/deltas.cpp] files).
The driver q-entries re-tokenize the raw corpus per query because the
driver contract reads plain parquet tables — right answers, wrong plan at
100×. This job is the scale path those entries point at:

  build_from_fetched  — ONE tokenize pass over the crawl's ``fetched``
                        output (latest non-304 text per URL) → postings +
                        zone postings written BUCKETED by word hash
                        (write_postings_bucketed), plus a slim docs_meta
                        side table for site grouping (J9).
  merge_delta         — LSM-style refresh: a new crawl round's fetched
                        delta is merged into the main index
                        (compact_postings) and atomically swapped in —
                        the reference's periodic `index` merge pass.
  search_*            — every query family the inline entries implement
                        (AND / OR / NOT / phrase / proximity / morphology
                        / zone-weighted ranking / site-grouped paging),
                        evaluated against probe_postings_bucketed: the
                        scan PRUNES to the query terms' word-hash buckets
                        (PartitionFilters), touching ~len(terms)/n_buckets
                        of the index instead of re-reading the corpus.

tests/test_search_job.py asserts every family returns IDENTICAL answers to
the inline-tokenize computation over the same documents, and that the
query-time scan actually partition-prunes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.postings import (
    build_postings,
    build_zone_postings,
    compact_postings,
    docs_with_all,
    docs_with_any,
    docs_without,
    expand_terms,
    phrase_match,
    probe_postings_bucketed,
    proximity_match,
    rank_results,
    rank_zone_weighted,
    write_postings_bucketed,
)


def _indexable_docs(fetched: DataFrame) -> DataFrame:
    """fetched rows → one (doc_id, host, text) per URL: 200-status rows
    with text, keeping the LATEST round's body (revisits re-index; 304s
    carry no text and never reach this point). max_by is deterministic —
    round is unique per URL (one fetch per URL per round)."""
    return (
        fetched.filter((F.col("status") == 200) & F.col("text").isNotNull())
        .groupBy("url_hash64")
        .agg(
            F.max_by("text", "round").alias("text"),
            F.max_by("host", "round").alias("host"),
        )
        .select(F.col("url_hash64").alias("doc_id"), "host", "text")
    )


class SearchJob:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 64):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.index_path = os.path.join(root, "postings")
        self.zone_path = os.path.join(root, "zone_postings")
        self.meta_path = os.path.join(root, "docs_meta")

    # -- build / refresh -----------------------------------------------------
    def build_from_fetched(
        self,
        fetched: DataFrame,
        stopwords: list[str] | None = None,
        title_tokens: int = 4,
    ) -> None:
        """One tokenize pass over the crawl output → stored bucketed index.
        At 100 TB this is the only corpus-sized job; every query afterwards
        is a pruned probe."""
        docs = _indexable_docs(fetched)
        postings = build_postings(docs, "doc_id", "text", stopwords)
        write_postings_bucketed(postings, self.index_path, self.n_buckets)
        zp = build_zone_postings(
            docs, "doc_id", "text", title_tokens=title_tokens
        )
        write_postings_bucketed(zp, self.zone_path, self.n_buckets)
        docs.select("doc_id", "host").write.mode("overwrite").parquet(
            self.meta_path
        )

    def merge_delta(self, fetched_delta: DataFrame) -> None:
        """LSM merge (SNK2): tokenize only the delta, merge into the main
        index, atomically swap the directory (the reference's periodic
        `index` merge). Work is O(delta + touched buckets), not O(corpus)."""
        delta = build_postings(_indexable_docs(fetched_delta), "doc_id", "text")
        tmp = self.index_path + ".merge_tmp"
        compact_postings(
            self.spark, self.index_path, delta, tmp, self.n_buckets
        )
        old = self.index_path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.index_path, old)
        os.rename(tmp, self.index_path)
        shutil.rmtree(old)

    # -- query families (all served from the stored, pruned index) -----------
    def probe(self, terms: list[str]) -> DataFrame:
        return probe_postings_bucketed(
            self.spark, self.index_path, terms, self.n_buckets
        )

    def search_and(self, terms: list[str]) -> DataFrame:
        return docs_with_all(self.probe(terms), terms)

    def search_any(self, terms: list[str]) -> DataFrame:
        return docs_with_any(self.probe(terms), terms)

    def search_not(self, terms: list[str], minus: str) -> DataFrame:
        return docs_without(
            self.search_and(terms), self.probe([minus]), minus
        )

    def search_phrase(self, w1: str, w2: str) -> DataFrame:
        return phrase_match(self.probe([w1, w2]), w1, w2)

    def search_proximity(self, w1: str, w2: str, window: int) -> DataFrame:
        return proximity_match(self.probe([w1, w2]), w1, w2, window)

    def search_any_form(
        self, terms: list[str], form_map: dict[str, list[str]] | None = None
    ) -> DataFrame:
        expanded = expand_terms(terms, form_map)
        return docs_with_any(self.probe(expanded), expanded)

    def search_zone_ranked(
        self, terms: list[str], title_weight: int = 8, k: int = 10
    ) -> DataFrame:
        zp = probe_postings_bucketed(
            self.spark, self.zone_path, terms, self.n_buckets
        )
        return rank_zone_weighted(zp, terms, title_weight, k)

    def search_ranked(
        self,
        terms: list[str],
        page: int = 0,
        page_size: int = 10,
        one_per_site: bool = False,
    ) -> DataFrame:
        scored = self.search_any(terms)
        meta = (
            self.spark.read.parquet(self.meta_path).withColumnRenamed(
                "doc_id", "doc"
            )
            if one_per_site
            else None
        )
        return rank_results(
            scored,
            docs_meta=meta,
            site_col="host" if one_per_site else None,
            page=page,
            page_size=page_size,
        )
