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
    eval_query,
    expand_terms,
    phrase_match,
    probe_postings_bucketed,
    proximity_match,
    rank_results,
    rank_zone_weighted,
    with_excerpts,
    write_postings_bucketed,
)


def _indexable_docs(fetched: DataFrame) -> DataFrame:
    """fetched rows → one (doc_id, host, text, fetched_unix) per URL:
    200-status rows with text, keeping the LATEST round's body (revisits
    re-index; 304s carry no text and never reach this point). max_by is
    deterministic — round is unique per URL (one fetch per URL per round).
    fetched_unix (the `after:` date-limit source) comes from sched_unix;
    slim test fixtures without it fall back to the round number — a
    monotone stamp with the same filtering semantics."""
    stamp = (
        F.col("sched_unix") if "sched_unix" in fetched.columns
        else F.col("round").cast("long")
    )
    return (
        fetched.filter((F.col("status") == 200) & F.col("text").isNotNull())
        .withColumn("_stamp", stamp)
        .groupBy("url_hash64")
        .agg(
            F.max_by("text", "round").alias("text"),
            F.max_by("host", "round").alias("host"),
            F.max_by("_stamp", "round").alias("fetched_unix"),
        )
        .select(
            F.col("url_hash64").alias("doc_id"), "host", "text",
            "fetched_unix",
        )
    )


class SearchJob:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 64,
        qcache_entries: int = 64,
    ):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.zone_path = os.path.join(root, "zone_postings")
        # qcache analog ([R:src/qcache.cpp]; round-3 verdict missing #2):
        # normalized query → (index epoch, materialized persisted result).
        # Keyed on the live index VERSION, so every build/merge flip
        # invalidates implicitly — a stale entry is simply never returned.
        from collections import OrderedDict

        self._qcache: "OrderedDict[tuple, tuple[int | None, DataFrame]]" = (
            OrderedDict()
        )
        self._qcache_entries = qcache_entries
        self.qcache_hits = 0
        self.qcache_misses = 0

    # -- versioned index layout (round-3 ADVICE: atomic swap) -----------------
    # The live main index is postings_v{N}; a one-int pointer file names N
    # and is replaced atomically (os.replace — the same manifest pattern
    # StateStore uses). A crash mid-merge leaves the pointer on the old
    # version with the old directory intact; the half-built next version is
    # clobbered by the retry. The just-replaced version is RETAINED one
    # generation so in-flight readers that resolved it before a flip can
    # finish; only older generations are GC'd.
    @property
    def _ptr_path(self) -> str:
        return os.path.join(self.root, "postings.version")

    def _live_version(self) -> int | None:
        try:
            with open(self._ptr_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    @property
    def index_path(self) -> str:
        v = self._live_version()
        if v is None:
            # pre-versioning layout (or not yet built)
            return os.path.join(self.root, "postings")
        return os.path.join(self.root, f"postings_v{v}")

    @property
    def meta_path(self) -> str:
        """Stored doc table (doc_id, host, text) — the excerpt source,
        versioned in lockstep with the main index (one pointer flips both)
        and PARTITIONED by doc_bucket = pmod(xxhash64(doc_id), n_buckets)
        so a results page's excerpt probe prunes to ≤ page_size buckets."""
        v = self._live_version()
        if v is None:
            return os.path.join(self.root, "docs_meta")
        return os.path.join(self.root, f"docs_meta_v{v}")

    def _flip_to(self, version: int) -> None:
        tmp = self._ptr_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._ptr_path)
        # stale qcache entries die WITH the flip, before _gc_versions can
        # delete the directories their recompute paths would read
        self._qcache_sweep(self._live_version())

    def _gc_versions(self, newest: int) -> None:
        """Drop generations older than newest-1 (keep live + previous)."""
        for k in range(0, max(0, newest - 1)):
            for base in ("postings_v", "docs_meta_v"):
                shutil.rmtree(
                    os.path.join(self.root, f"{base}{k}"), ignore_errors=True
                )
        if newest >= 1:
            for legacy in ("postings", "docs_meta"):
                shutil.rmtree(
                    os.path.join(self.root, legacy), ignore_errors=True
                )

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
        v = self._live_version()
        nxt = 0 if v is None else v + 1
        new_dir = os.path.join(self.root, f"postings_v{nxt}")
        shutil.rmtree(new_dir, ignore_errors=True)  # crashed prior attempt
        write_postings_bucketed(postings, new_dir, self.n_buckets)
        zp = build_zone_postings(
            docs, "doc_id", "text", title_tokens=title_tokens
        )
        write_postings_bucketed(zp, self.zone_path, self.n_buckets)
        self._write_meta(
            docs.select("doc_id", "host", "text", "fetched_unix"),
            os.path.join(self.root, f"docs_meta_v{nxt}"),
        )
        self._flip_to(nxt)
        self._gc_versions(nxt)

    def _write_meta(self, docs: DataFrame, path: str) -> None:
        """Stored-doc table: (doc_id, host, text) partitioned by doc-hash
        bucket. host-only readers (site grouping) pay nothing for text —
        parquet column pruning — and the excerpt probe prunes partitions."""
        shutil.rmtree(path, ignore_errors=True)
        (
            docs.withColumn(
                "doc_bucket",
                F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets)),
            )
            .repartition("doc_bucket")
            .write.mode("overwrite")
            .partitionBy("doc_bucket")
            .parquet(path)
        )

    def merge_delta(self, fetched_delta: DataFrame) -> None:
        """LSM merge (SNK2): tokenize only the delta, merge into the next
        index GENERATION, then atomically flip the pointer file (the
        reference's periodic `index` merge). Work is O(delta + touched
        buckets), not O(corpus). There is no window with no live index: a
        crash before the flip leaves the old pointer + old directory; the
        replaced generation survives one merge for in-flight readers
        (round-3 ADVICE fix — the old rename/rename swap had both a no-dir
        window and a reader-error window)."""
        delta_docs = _indexable_docs(fetched_delta).localCheckpoint()
        delta = build_postings(delta_docs, "doc_id", "text")
        # the reference's delete pass: a URL whose LATEST delta row answers
        # 404/410 leaves the index and the stored-text table entirely
        gone = (
            fetched_delta.groupBy("url_hash64")
            .agg(F.max_by("status", "round").alias("last_status"))
            .filter(F.col("last_status").isin(404, 410))
            .select(F.col("url_hash64").alias("doc"))
            .localCheckpoint()
        )
        src = self.index_path  # resolved BEFORE the flip
        meta_src = self.meta_path
        v = self._live_version()
        nxt = 0 if v is None else v + 1
        dst = os.path.join(self.root, f"postings_v{nxt}")
        shutil.rmtree(dst, ignore_errors=True)  # crashed prior attempt
        compact_postings(
            self.spark, src, delta, dst, self.n_buckets, drop_docs=gone
        )
        # stored-text refresh: delta docs replace their old rows (revisit →
        # newest body serves the excerpt), gone docs drop, everything else
        # carries over. At scale both sides partition-prune to the ≤|delta|
        # doc_buckets the delta touches; untouched buckets copy through.
        gone_ids = gone.select(F.col("doc").alias("doc_id"))
        old_meta = self.spark.read.parquet(meta_src).select(
            "doc_id", "host", "text", "fetched_unix"
        )
        merged_meta = (
            old_meta.join(delta_docs.select("doc_id"), "doc_id", "left_anti")
            .join(gone_ids, "doc_id", "left_anti")
            .unionByName(
                delta_docs.join(gone_ids, "doc_id", "left_anti").select(
                    "doc_id", "host", "text", "fetched_unix"
                )
            )
        )
        self._write_meta(
            merged_meta, os.path.join(self.root, f"docs_meta_v{nxt}")
        )
        self._flip_to(nxt)
        self._gc_versions(nxt)

    # -- qcache (repeated-query result memo) ----------------------------------
    def _normalize_query(
        self, family: str, args: tuple, kwargs: dict
    ) -> tuple:
        """Canonical cache key: family + lowercased terms (SORTED for the
        set-semantics families AND/OR — `spark data` and `data spark` are
        the same query) + remaining params, all hashable."""
        def norm(v):
            if isinstance(v, list):
                return tuple(
                    x.lower() if isinstance(x, str) else x for x in v
                )
            if isinstance(v, dict):
                return tuple(sorted((k, norm(x)) for k, x in v.items()))
            return v

        na = tuple(norm(a) for a in args)
        if family in ("and", "any", "any_form", "zone_ranked", "ranked",
                      "excerpts") and na and isinstance(na[0], tuple):
            na = (tuple(sorted(na[0])),) + na[1:]
        if family == "query" and na and isinstance(na[0], str):
            # normalize through the parser: '(a&b)' and 'a  b' share an AST
            # (frozen dataclasses — hashable), hence a cache entry
            from ..functions.queryparse import parse_query

            na = (parse_query(na[0]),) + na[1:]
        return (family, na, tuple(sorted((k, norm(v)) for k, v in kwargs.items())))

    def _qcache_sweep(self, live_epoch) -> None:
        """Unpersist + drop EVERY entry whose epoch is not the live one —
        not just a re-accessed key (round-4 ADVICE): stale persisted
        DataFrames otherwise pin executor memory until LRU pressure, and a
        stale entry's cache-eviction recompute would read a generation
        _gc_versions may already have deleted. Called on every flip
        (build/merge) and defensively per lookup (dict-sized, no jobs)."""
        stale = [k for k, (ep, _) in self._qcache.items() if ep != live_epoch]
        for k in stale:
            _, df = self._qcache.pop(k)
            df.unpersist()

    def search_cached(self, family: str, *args, **kwargs) -> DataFrame:
        """Serve `search_<family>` through the qcache: a repeat of the same
        normalized query at the same index epoch returns the SAME
        materialized (persisted) DataFrame — zero new shuffle jobs, the
        re-collect is an InMemoryTableScan (plan-asserted in
        tests/test_qcache.py). Any index append/merge flips the version
        pointer, so the next lookup misses and recomputes against the new
        index; ALL stale entries are swept at that point. LRU-capped."""
        key = self._normalize_query(family, args, kwargs)
        epoch = self._live_version()
        self._qcache_sweep(epoch)
        hit = self._qcache.get(key)
        if hit is not None:
            self._qcache.move_to_end(key)
            self.qcache_hits += 1
            return hit[1]
        self.qcache_misses += 1
        df = getattr(self, f"search_{family}")(*args, **kwargs).persist()
        df.count()  # materialize now: later repeats do no recompute
        self._qcache[key] = (epoch, df)
        self._qcache.move_to_end(key)
        while len(self._qcache) > self._qcache_entries:
            _, (_, evicted) = self._qcache.popitem(last=False)
            evicted.unpersist()
        return df

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

    def search_query(
        self, q: str, links_to: DataFrame | None = None
    ) -> DataFrame:
        """The s.cgi query-language front door: parse the boolean query
        string (& | ~ parens "phrases" site:host link:url,
        functions/queryparse), probe the stored index for EXACTLY the
        query's terms (bucket-pruned scan), evaluate the AST →
        (doc, score). `site:` resolves against the stored-text table's host
        column (lazy — the scan only runs if the query uses it); `link:`
        needs the crawl's link graph passed as ``links_to`` (doc, target).
        One parse feeds both this and the DuckDB oracle generator, so the
        language's semantics are value-hash-checked end to end (q55/q56)."""
        from ..functions.queryparse import parse_query, query_terms

        ast = parse_query(q)
        meta = self.spark.read.parquet(self.meta_path)
        site_of = meta.select(
            F.col("doc_id").alias("doc"), F.col("host").alias("site")
        )
        fetched_at = meta.select(
            F.col("doc_id").alias("doc"), "fetched_unix"
        )
        return eval_query(
            self.probe(query_terms(ast)), ast,
            site_of=site_of, links_to=links_to, fetched_at=fetched_at,
        )

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
            self.spark.read.parquet(self.meta_path)
            .select(F.col("doc_id").alias("doc"), "host")
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

    def search_excerpts(
        self,
        terms: list[str],
        page: int = 0,
        page_size: int = 10,
        one_per_site: bool = False,
        before: int = 5,
        width: int = 12,
        title_tokens: int = 4,
    ) -> DataFrame:
        """Ranked results page WITH per-hit context excerpts (the s.cgi
        results-page output side — round-3 verdict missing #1): ranks off
        the stored index, then joins the page (broadcast — it is page_size
        rows) to the stored-text table and computes the deterministic
        with_excerpts rule. Pure DataFrame path, nothing collected."""
        ranked = self.search_ranked(
            terms, page=page, page_size=page_size, one_per_site=one_per_site
        )
        stored = self.spark.read.parquet(self.meta_path).select(
            "doc_id", "text"
        )
        return with_excerpts(
            ranked, stored, terms, doc_col="doc_id",
            before=before, width=width, title_tokens=title_tokens,
        )

    def excerpts_for_page(
        self,
        terms: list[str],
        doc_ids: list[int],
        before: int = 5,
        width: int = 12,
        title_tokens: int = 4,
    ) -> DataFrame:
        """Excerpts for an already-rendered page of doc ids — the pruned
        serving path: the ids' doc_buckets are computed driver-side (same
        JVM hash the writer used) and the stored-text scan PRUNES to those
        partitions (PartitionFilters — plan-asserted in
        tests/test_search_job.py), touching ≤ len(ids) buckets instead of
        the corpus. ``doc_ids`` is a results PAGE (bounded, user-facing),
        not a data path."""
        rows = (
            self.spark.createDataFrame(
                [(int(d),) for d in doc_ids], "doc_id long"
            )
            .select(
                F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets)).alias("b")
            )
            .collect()
        )
        buckets = sorted({r["b"] for r in rows})
        stored = (
            self.spark.read.parquet(self.meta_path)
            .filter(
                F.col("doc_bucket").isin(buckets)
                & F.col("doc_id").isin([int(d) for d in doc_ids])
            )
            .select("doc_id", "text")
        )
        hits = stored.select(F.col("doc_id").alias("doc"))
        return with_excerpts(
            hits, stored, terms, doc_col="doc_id",
            before=before, width=width, title_tokens=title_tokens,
        )
