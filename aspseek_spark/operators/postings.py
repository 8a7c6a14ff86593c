"""Search-side posting lists + boolean/phrase query evaluation (SURVEY.md
§2.3 J7/J8, §2.7 SO4/SO5, §2.4 A3/A4, §2.5 W4 — milestone M7).

The reference stores per-(doc, word) postings with positions and evaluates
boolean expression trees against delta-compressed posting files
([R:src/words.cpp], [R:src/deltas.cpp], [R:src/search.cpp]). Spark-first
re-expression:

  build_postings   — tokenize → explode → groupBy(doc, word): positions
                     array + tf. One shuffle; partitioned/bucketed by word
                     at scale so term probes are partition-pruned scans.
  AND              — semi-join chain / groupBy-having-count
  OR               — union + distinct
  NOT              — left_anti (SO4)
  phrase           — self-join on doc + adjacent-position arrays_overlap (J8)
  ranking          — zone-weighted tf (+ optional popularity) desc, paged,
                     per-site best hit via row_number (W4/J9)
  stopword filter  — broadcast isin (F8)
  df/dictionary    — docs-per-word stats, approx at scale (A4)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import spark_pmod_xxhash64
from .textstats import tokens_col

# (word, n_buckets) → bucket id memo for probe_postings_bucketed — a pure
# function of its key (xxhash64 is deterministic), never invalidated
_BUCKET_MEMO: dict[tuple[str, int], int] = {}


def build_postings(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """(doc, word, positions array<int>, tf) from raw text (A3)."""
    toks = docs.select(
        F.col(doc_col).alias("doc"),
        F.posexplode(tokens_col(text_col)).alias("pos", "word"),
    ).withColumn("word", F.lower("word"))
    if stopwords:
        toks = toks.filter(~F.col("word").isin(stopwords))  # F8
    return toks.groupBy("doc", "word").agg(
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.count("*").alias("tf"),
    )


def word_doc_freq(
    postings: DataFrame, approx: bool = False, unique_doc_word: bool = False
) -> DataFrame:
    """df(word) dictionary stats (A4); approx_count_distinct at scale.

    ``unique_doc_word=True`` declares the input holds AT MOST ONE row per
    (doc, word) — true for every stored-index relation (build_postings /
    merge paths groupBy (doc, word); the realtime overlay is newest-wins, so
    a doc's rows come from exactly one source). Under that invariant
    countDistinct(doc) == count(*), and the plan drops the count-distinct
    expand (2 Exchange → 1) — r07 guide §2.4 (one exchange instead of two
    for the same answer)."""
    agg = (
        F.approx_count_distinct("doc")
        if approx
        else (F.count("*") if unique_doc_word else F.countDistinct("doc"))
    ).alias("df")
    return postings.groupBy("word").agg(agg, F.sum("tf").alias("cf"))


def docs_with_all(postings: DataFrame, terms: list[str]) -> DataFrame:
    """AND: docs containing every term (groupBy-having over a broadcast
    semi-join — one shuffle regardless of term count).

    PRECONDITION (r07): ``postings`` holds at most one row per (doc, word)
    — the postings-relation invariant every in-repo producer maintains
    (build_postings groups by (doc, word); compact/merge re-group; the
    realtime overlay anti-joins touched docs so each doc's rows come from
    one source). count(word) therefore equals countDistinct(word) and the
    plan needs ONE exchange instead of the count-distinct two (guide §2.4);
    tests/test_operators.py pins the equivalence."""
    lowered = sorted(set(t.lower() for t in terms))
    hits = postings.filter(F.col("word").isin(lowered))
    return (
        hits.groupBy("doc")
        .agg(F.count("word").alias("nw"), F.sum("tf").alias("score"))
        .filter(F.col("nw") == len(lowered))
        .select("doc", "score")
    )


def docs_with_any(postings: DataFrame, terms: list[str]) -> DataFrame:
    """OR: union semantics with summed tf score."""
    hits = postings.filter(F.col("word").isin([t.lower() for t in terms]))
    return hits.groupBy("doc").agg(F.sum("tf").alias("score"))


def docs_without(result: DataFrame, postings: DataFrame, term: str) -> DataFrame:
    """NOT: subtract docs containing term (SO4: left_anti)."""
    neg = postings.filter(F.col("word") == term.lower()).select("doc")
    return result.join(neg, "doc", "left_anti")


def phrase_match(postings: DataFrame, w1: str, w2: str) -> DataFrame:
    """Docs where w2 directly follows w1 (J8): self-join on doc +
    arrays_overlap(positions(w1)+1, positions(w2))."""
    a = postings.filter(F.col("word") == w1.lower()).select(
        "doc", F.col("positions").alias("p1")
    )
    b = postings.filter(F.col("word") == w2.lower()).select(
        "doc", F.col("positions").alias("p2")
    )
    return (
        a.join(b, "doc")
        .filter(
            F.arrays_overlap(
                F.transform("p1", lambda x: x + 1), F.col("p2")
            )
        )
        .select("doc")
    )


def proximity_match(postings: DataFrame, w1: str, w2: str, window: int) -> DataFrame:
    """Docs where w1 and w2 occur within ``window`` positions (general
    proximity: explode + range predicate theta-join, J8)."""
    a = postings.filter(F.col("word") == w1.lower()).select(
        "doc", F.explode("positions").alias("pa")
    )
    b = postings.filter(F.col("word") == w2.lower()).select(
        F.col("doc").alias("doc_b"), F.explode("positions").alias("pb")
    )
    return (
        a.join(
            b,
            on=[
                a.doc == b.doc_b,
                F.abs(F.col("pa") - F.col("pb")) <= window,
            ],
        )
        .select("doc")
        .distinct()
    )


def phrase_match_n(postings: DataFrame, words: list[str]) -> DataFrame:
    """n-word exact phrase (J8 generalized): (doc, score = occurrence
    count). Occurrence positions are the running intersection
    S = positions(w1) ∩ (positions(w2)−1) ∩ ... ∩ (positions(wn)−(n−1)),
    computed with array_intersect over the probed postings — one join per
    phrase word, no explode, no UDF."""

    def _shift(k: int):
        # factory, not a loop-var lambda (late binding would shift every
        # word by the LAST offset)
        return lambda x: x - k

    lowered = [w.lower() for w in words]
    base = postings.filter(F.col("word") == lowered[0]).select(
        "doc", F.col("positions").alias("_p")
    )
    for k, w in enumerate(lowered[1:], start=1):
        nxt = postings.filter(F.col("word") == w).select(
            F.col("doc").alias("_d"), F.col("positions").alias("_q")
        )
        base = (
            base.join(nxt, base["doc"] == nxt["_d"])
            .withColumn(
                "_p",
                F.array_intersect(
                    F.col("_p"), F.transform(F.col("_q"), _shift(k))
                ),
            )
            .filter(F.size("_p") > 0)
            .select("doc", "_p")
        )
    return base.select("doc", F.size("_p").cast("long").alias("score"))


def eval_query(
    postings: DataFrame,
    node,
    site_of: DataFrame | None = None,
    links_to: DataFrame | None = None,
    fetched_at: DataFrame | None = None,
) -> DataFrame:
    """Evaluate a parsed search query (functions/queryparse AST) against a
    postings DataFrame → (doc, score). The boolean operators map to the
    §2.7 set ops: AND = inner join (scores summed), OR = union + groupBy
    sum, AND NOT = left_anti; phrases go through phrase_match_n. Negative-
    only queries and OR over a negated subquery raise ValueError (the
    reference's s.cgi refuses them too — they denote 'everything but',
    which is unbounded).

    Modifier atoms (score-neutral filter sets, scored 0 so AND passes the
    text score through): `site:` needs ``site_of`` (doc, site); `link:`
    needs ``links_to`` (doc, target) — the crawl's link graph keyed by the
    LINKING doc; `after:` needs ``fetched_at`` (doc, fetched_unix) — the
    s.cgi date-limit analog over the latest fetch time."""
    from ..functions.queryparse import (
        After,
        And,
        Before,
        Link,
        Not,
        Or,
        Phrase,
        Site,
        Term,
    )

    def walk(n):
        if isinstance(n, Term):
            return "pos", postings.filter(F.col("word") == n.word).select(
                "doc", F.col("tf").cast("long").alias("score")
            )
        if isinstance(n, Phrase):
            return "pos", phrase_match_n(postings, list(n.words))
        if isinstance(n, Site):
            if site_of is None:
                raise ValueError("site: filter needs the site_of table")
            return "pos", site_of.filter(
                F.col("site") == n.host
            ).select("doc", F.lit(0).cast("long").alias("score"))
        if isinstance(n, Link):
            if links_to is None:
                raise ValueError("link: filter needs the links_to table")
            return "pos", links_to.filter(
                F.col("target") == n.url
            ).select("doc").distinct().withColumn(
                "score", F.lit(0).cast("long")
            )
        if isinstance(n, After):
            if fetched_at is None:
                raise ValueError("after: filter needs the fetched_at table")
            return "pos", fetched_at.filter(
                F.col("fetched_unix") >= F.lit(n.ts)
            ).select("doc", F.lit(0).cast("long").alias("score"))
        if isinstance(n, Before):
            if fetched_at is None:
                raise ValueError("before: filter needs the fetched_at table")
            # strictly-before (half-open with After: >= a, < b)
            return "pos", fetched_at.filter(
                F.col("fetched_unix") < F.lit(n.ts)
            ).select("doc", F.lit(0).cast("long").alias("score"))
        if isinstance(n, Not):
            if isinstance(n.child, Not):  # ~~x = x
                return walk(n.child.child)
            k, df = walk(n.child)
            if k == "neg":
                raise ValueError(
                    "negation of a composite negative subquery is unsupported"
                )
            return "neg", df.select("doc")
        if isinstance(n, And):
            ka, a = walk(n.left)
            kb, b = walk(n.right)
            if ka == "pos" and kb == "pos":
                b2 = b.select(
                    F.col("doc").alias("_bd"), F.col("score").alias("_bs")
                )
                return "pos", a.join(b2, a["doc"] == b2["_bd"]).select(
                    "doc", (F.col("score") + F.col("_bs")).alias("score")
                )
            if ka == "neg" and kb == "neg":
                return "neg", a.unionByName(b).distinct()
            pos, neg = (a, b) if ka == "pos" else (b, a)
            return "pos", pos.join(neg, "doc", "left_anti")
        if isinstance(n, Or):
            ka, a = walk(n.left)
            kb, b = walk(n.right)
            if ka == "neg" or kb == "neg":
                raise ValueError("OR over a negated subquery is unsupported")
            return "pos", a.unionByName(b).groupBy("doc").agg(
                F.sum("score").alias("score")
            )
        raise TypeError(f"unknown query node {n!r}")

    kind, df = walk(node)
    if kind == "neg":
        raise ValueError("negative-only query matches an unbounded set")
    return df


def _sq(s: str) -> str:
    """Escape a value for interpolation into a single-quoted SQL literal.
    The tokenizer allows apostrophes inside words (o'brien), so every
    Term/Phrase/Site value the oracle generators embed must double them —
    otherwise the generated DuckDB SQL is invalid/injectable (round-4
    ADVICE). The Spark side takes values via F.lit and needs nothing."""
    return s.replace("'", "''")


def query_oracle_sql(
    node,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    site_col: str | None = None,
    time_col: str | None = None,
    link_expr: str | None = None,
) -> str:
    """DuckDB SQL for the exact eval_query semantics, generated from the
    SAME AST — one parse, two backends (the excerpt_oracle_sql pattern), so
    the driver's value-hash gate covers the full query language. Returns a
    complete SELECT yielding (doc_id, score). ``site_col`` names the
    table's site column for `site:` atoms; ``time_col`` its timestamp
    column for `after:` atoms; ``link_expr`` a parenthesized SQL subquery
    yielding (doc, target) rows for `link:` atoms — the link-graph twin of
    whatever ``links_to`` DataFrame the Spark side evaluates against."""
    from ..functions.queryparse import (
        After,
        And,
        Before,
        Link,
        Not,
        Or,
        Phrase,
        Site,
        Term,
    )

    def walk(n) -> tuple[str, str]:
        if isinstance(n, Term):
            return "pos", (
                "(SELECT doc, count(*)::BIGINT AS score FROM qtoks "
                f"WHERE word = '{_sq(n.word)}' GROUP BY doc)"
            )
        if isinstance(n, Site):
            if site_col is None:
                raise ValueError("site: oracle needs site_col")
            return "pos", (
                f"(SELECT {id_col} AS doc, 0::BIGINT AS score FROM {table} "
                f"WHERE {site_col} = '{_sq(n.host)}')"
            )
        if isinstance(n, Link):
            if link_expr is None:
                raise ValueError("link: oracle needs link_expr")
            return "pos", (
                "(SELECT DISTINCT doc, 0::BIGINT AS score FROM "
                f"{link_expr} lk WHERE lk.target = '{_sq(n.url)}')"
            )
        if isinstance(n, After):
            if time_col is None:
                raise ValueError("after: oracle needs time_col")
            return "pos", (
                f"(SELECT {id_col} AS doc, 0::BIGINT AS score FROM {table} "
                f"WHERE {time_col} >= {n.ts})"
            )
        if isinstance(n, Before):
            if time_col is None:
                raise ValueError("before: oracle needs time_col")
            return "pos", (
                f"(SELECT {id_col} AS doc, 0::BIGINT AS score FROM {table} "
                f"WHERE {time_col} < {n.ts})"
            )
        if isinstance(n, Phrase):
            conds = " AND ".join(
                f"lower(t[i + {k}]) = '{_sq(w)}'"
                for k, w in enumerate(n.words)
            )
            return "pos", (
                f"(SELECT {id_col} AS doc, count(*)::BIGINT AS score "
                "FROM qarr, unnest(generate_series(1, "
                f"len(t) - {len(n.words) - 1})) AS u(i) "
                f"WHERE {conds} GROUP BY {id_col})"
            )
        if isinstance(n, Not):
            if isinstance(n.child, Not):  # ~~x = x
                return walk(n.child.child)
            k, sql = walk(n.child)
            if k == "neg":
                raise ValueError(
                    "negation of a composite negative subquery is unsupported"
                )
            return "neg", f"(SELECT doc FROM {sql} nn)"
        if isinstance(n, And):
            ka, a = walk(n.left)
            kb, b = walk(n.right)
            if ka == "pos" and kb == "pos":
                return "pos", (
                    "(SELECT a.doc, (a.score + b.score)::BIGINT AS score "
                    f"FROM {a} a JOIN {b} b ON a.doc = b.doc)"
                )
            if ka == "neg" and kb == "neg":
                return "neg", (
                    f"(SELECT doc FROM {a} na UNION SELECT doc FROM {b} nb)"
                )
            pos, neg = (a, b) if ka == "pos" else (b, a)
            return "pos", (
                f"(SELECT a.doc, a.score FROM {pos} a "
                f"WHERE a.doc NOT IN (SELECT doc FROM {neg} nx))"
            )
        if isinstance(n, Or):
            ka, a = walk(n.left)
            kb, b = walk(n.right)
            if ka == "neg" or kb == "neg":
                raise ValueError("OR over a negated subquery is unsupported")
            return "pos", (
                "(SELECT doc, sum(score)::BIGINT AS score FROM "
                f"(SELECT * FROM {a} ua UNION ALL SELECT * FROM {b} ub) uu "
                "GROUP BY doc)"
            )
        raise TypeError(f"unknown query node {n!r}")

    kind, expr = walk(node)
    if kind == "neg":
        raise ValueError("negative-only query matches an unbounded set")
    return f"""
        WITH qtoks AS (
            SELECT {id_col} AS doc,
                   lower(unnest(list_filter(string_split({text_col}, ' '),
                                            x -> x <> ''))) AS word
            FROM {table}
        ), qarr AS (
            SELECT {id_col},
                   list_filter(string_split({text_col}, ' '), x -> x <> '')
                       AS t
            FROM {table}
        )
        SELECT doc AS {id_col}, score FROM {expr} q
    """


def expand_terms(
    terms: list[str], form_map: dict[str, list[str]] | None = None
) -> list[str]:
    """S10 ispell-morphology analog ([R:src/spell.cpp]): a query word
    expands to all its word forms before the posting probe. The form map is
    a broadcast-sized dict (ispell dictionaries offline at scale); the
    default map covers trivial English inflection so the operator is
    exercised without dictionary files."""
    out: list[str] = []
    for t in terms:
        t = t.lower()
        out.append(t)
        if form_map and t in form_map:
            out.extend(w.lower() for w in form_map[t])
        else:
            # minimal rule-based fallback: plural/singular + -ing/-ed
            if t.endswith("s") and len(t) > 3:
                out.append(t[:-1])
            else:
                out.append(t + "s")
    # preserve first-occurrence order, dedup (deterministic)
    seen: set[str] = set()
    uniq = []
    for t in out:
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    return uniq


def load_form_map(path: str) -> dict[str, list[str]]:
    """S10: load a word-form dictionary file into the expand_terms form map
    (the ispell-dictionary analog, [R:src/spell.cpp] loads affix-expanded
    dictionaries). Format: one lemma per line, ``lemma: form1 form2 ...``;
    '#' comments and blank lines ignored; everything lowercased. The map is
    driver-side (broadcast-sized), exactly like ispell dictionaries are
    loaded once per indexer process."""
    out: dict[str, list[str]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            lemma, _, forms = line.partition(":")
            lemma = lemma.strip().lower()
            if lemma:
                out[lemma] = [w.lower() for w in forms.split()]
    return out


def docs_with_any_form(
    postings: DataFrame, terms: list[str],
    form_map: dict[str, list[str]] | None = None,
) -> DataFrame:
    """OR over morphology-expanded terms (S10 + SO5)."""
    return docs_with_any(postings, expand_terms(terms, form_map))


def build_zone_postings(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    title_col: str | None = None,
    title_tokens: int = 4,
) -> DataFrame:
    """Zone-aware postings (W4 depth, reference zone bits in word postings
    [R:src/parser.cpp] — title/meta/body weighting): (doc, word, tf_title,
    tf_body, zone_mask) where zone_mask bit 1 = title, bit 2 = body.

    When ``title_col`` is None the title zone is the first ``title_tokens``
    tokens of the text (the synthetic corpus has no separate title column);
    the crawl's fetched table passes title_col from the parser's
    extract_title output. One shuffle (the groupBy); all tokenizing codegen.
    """
    toks = tokens_col(text_col)
    title_toks = (
        tokens_col(title_col) if title_col is not None
        else F.slice(toks, 1, title_tokens)
    )
    body = docs.select(
        F.col(doc_col).alias("doc"),
        F.explode(toks).alias("word"),
        F.lit(2).alias("zone"),
    )
    title = docs.select(
        F.col(doc_col).alias("doc"),
        F.explode(title_toks).alias("word"),
        F.lit(1).alias("zone"),
    )
    merged = body.unionByName(title).withColumn("word", F.lower("word"))
    agg = merged.groupBy("doc", "word").agg(
        F.sum(F.when(F.col("zone") == 1, 1).otherwise(0)).alias("tf_title"),
        F.sum(F.when(F.col("zone") == 2, 1).otherwise(0)).alias("tf_body"),
    )
    return agg.withColumn(
        "zone_mask",
        F.when(F.col("tf_title") > 0, 1).otherwise(0)
        + F.when(F.col("tf_body") > 0, 2).otherwise(0),
    )


def rank_zone_weighted(
    zone_postings: DataFrame,
    terms: list[str],
    title_weight: int = 8,
    k: int = 10,
) -> DataFrame:
    """Zone-weighted OR ranking: score = Σ_terms (title_weight·tf_title +
    tf_body); deterministic top-k (score desc, doc asc). The reference
    weights title/meta hits above body hits when scoring ([R:src/ranks.cpp]
    semantics)."""
    hits = zone_postings.filter(
        F.col("word").isin([t.lower() for t in terms])
    )
    scored = hits.groupBy("doc").agg(
        F.sum(
            F.lit(title_weight) * F.col("tf_title") + F.col("tf_body")
        ).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc")).limit(k)


def write_postings_bucketed(
    postings: DataFrame, path: str, n_buckets: int = 64
) -> None:
    """SNK2 main-index layout: postings partitioned by word-hash bucket so
    a term probe prunes to one directory (the delta-file analog of
    [R:src/deltas.cpp]'s per-word posting files). At real scale this is a
    bucketed Iceberg table; here: partitioned parquet."""
    (
        postings.withColumn(
            "word_bucket", F.pmod(F.xxhash64("word"), F.lit(n_buckets))
        )
        .repartition("word_bucket")
        .write.mode("overwrite")
        .partitionBy("word_bucket")
        .parquet(path)
    )


def probe_postings_bucketed(
    spark, path: str, terms: list[str], n_buckets: int = 64,
    schema: str | None = None,
) -> DataFrame:
    """Term probe against the BUCKETED postings layout: computes the terms'
    word-hash buckets driver-side and prunes the scan to those partition
    directories — the scale path for q35-style AND/OR queries (re-tokenizing
    the corpus per query is fine at sf0.1 and wrong at 100×; probing the
    stored index touches only ~len(terms)/n_buckets of it). Returns the
    matching postings rows; feed them to docs_with_all / docs_with_any.

    ``schema`` (incl. the word_bucket partition column) makes the read
    inference-free — required for directories that may hold ZERO part
    files (a delete-only realtime segment writes an empty partitioned
    parquet, which has no footer to infer from)."""
    from pyspark.sql import functions as F  # local: keep module import light

    lowered = [t.lower() for t in terms]
    # same hash family the writer used (JVM xxhash64 seed 42 over UTF-8),
    # reproduced DRIVER-SIDE by the spec-faithful pure-Python XXH64
    # (functions/hashing.spark_pmod_xxhash64, parity-tested against the JVM
    # bit-for-bit) and memoized — until r07 this was a 1-row Spark job per
    # probe call, ~0.2-0.3 s of pure driver latency on EVERY cold search
    # entry (guide §1/§5: the driver should do no data work on a hot path).
    buckets = sorted({
        _BUCKET_MEMO.setdefault(
            (t, n_buckets), spark_pmod_xxhash64(t, n_buckets)
        )
        for t in lowered
    })
    reader = spark.read if schema is None else spark.read.schema(schema)
    probe = reader.parquet(path).filter(
        F.col("word_bucket").isin(buckets) & F.col("word").isin(lowered)
    )
    return probe.drop("word_bucket")


def compact_postings(
    spark,
    main_path: str,
    delta: DataFrame,
    out_path: str,
    n_buckets: int = 64,
    drop_docs: DataFrame | None = None,
) -> None:
    """SNK2 LSM-style merge: a re-crawled doc's postings REPLACE its old
    ones (the delta's doc set is anti-joined out of the main index before
    the union — a plain union would keep stale words searchable on a
    revisited doc), and ``drop_docs`` (one `doc` column — e.g. URLs that
    answered 404/410 on revisit) leave the index entirely, the reference's
    delete pass. Both doc sets are delta-sized → broadcast anti-joins
    against the bucketed main scan. Duplicate delta rows still merge
    (positions concatenated, tf summed)."""
    main = spark.read.parquet(main_path).drop("word_bucket")
    delta_docs = delta.select("doc").distinct()
    main = main.join(F.broadcast(delta_docs), "doc", "left_anti")
    if drop_docs is not None:
        drop = drop_docs.select("doc").distinct()
        main = main.join(F.broadcast(drop), "doc", "left_anti")
        delta = delta.join(F.broadcast(drop), "doc", "left_anti")
    merged = (
        main.unionByName(delta)
        .groupBy("doc", "word")
        .agg(
            F.sort_array(F.flatten(F.collect_list("positions"))).alias("positions"),
            F.sum("tf").alias("tf"),
        )
    )
    write_postings_bucketed(merged, out_path, n_buckets)


def with_excerpts(
    hits: DataFrame,
    docs: DataFrame,
    terms: list[str],
    doc_col: str = "doc_id",
    text_col: str = "text",
    before: int = 5,
    width: int = 12,
    title_tokens: int = 4,
) -> DataFrame:
    """Per-hit context excerpt — the results-page output side the reference
    renders through its templates ([R:src/templates.cpp] excerpts around
    query-term hits; round-3 verdict "What's missing" #1). Deterministic,
    SQL-expressible rule so the driver can value-hash-oracle it:

      best_term = the query term with the highest TOKEN tf in the doc
                  (tie → lexicographically smallest term)
      p         = 1-based token index of best_term's first occurrence
      start     = 1 if p lies in the title zone (first ``title_tokens``
                  tokens — zone-aware: title hits show the title), else
                  max(1, p - ``before``)
      excerpt   = ``width`` tokens from start, joined by single spaces

    Everything is codegen column expressions over the joined text (split /
    filter / array_position / slice / array_join — no UDF). ``hits`` keeps
    its columns (doc, score, ...) and gains best_term + excerpt. The join
    strategy is left to Catalyst/AQE: a page of hits broadcasts against the
    stored-text table, a corpus-wide hit set shuffles both sides on doc;
    the bucketed serving path (SearchJob.excerpts_for_page) additionally
    partition-prunes the stored-text scan. Precondition: every hit doc
    contains ≥1 query term (AND/OR results do by construction) — the rule
    is undefined (and the SQL oracle NULL) otherwise.
    """
    toks = tokens_col(text_col)
    low = F.transform(toks, lambda t: F.lower(t))
    lowered = sorted({t.lower() for t in terms})

    def _tf(term: str):
        # factory, NOT a default-arg lambda: a two-parameter lambda would be
        # read by F.filter as an (element, index) function
        return F.size(F.filter(low, lambda x: x == F.lit(term)))

    best_term = F.lit(lowered[0])
    best_tf = _tf(lowered[0])
    for t in lowered[1:]:
        tf = _tf(t)
        gt = tf > best_tf
        best_term = F.when(gt, F.lit(t)).otherwise(best_term)
        best_tf = F.when(gt, tf).otherwise(best_tf)
    p = F.array_position(low, best_term)
    start = F.when(
        (p >= 1) & (p <= title_tokens), F.lit(1)
    ).otherwise(F.greatest(F.lit(1), (p - F.lit(before)).cast("int")))
    excerpt = F.array_join(F.slice(toks, start, width), " ")
    joined = hits.join(
        docs.select(F.col(doc_col).alias("__d"), text_col),
        hits["doc"] == F.col("__d"),
    )
    return joined.select(
        *hits.columns, best_term.alias("best_term"), excerpt.alias("excerpt")
    )


def excerpt_oracle_sql(
    terms: list[str],
    before: int = 5,
    width: int = 12,
    title_tokens: int = 4,
    text_expr: str = "text",
) -> str:
    """DuckDB SQL fragment computing (best_term, excerpt) per row under the
    exact with_excerpts rule — composed into driver oracle queries so the
    excerpt path is value-hash-checked, not rows-only. Supports any term
    count via chained CASE in ascending term order (strict > keeps the
    lexicographically smaller term on ties, mirroring the Spark fold)."""
    lowered = sorted({t.lower() for t in terms})

    def tf(t: str) -> str:
        return (
            "len(list_filter(list_transform(toks, x -> lower(x)), "
            f"x -> x = '{_sq(t)}'))"
        )

    best = f"'{_sq(lowered[0])}'"
    best_tf = tf(lowered[0])
    for t in lowered[1:]:
        best = (
            f"CASE WHEN {tf(t)} > {best_tf} THEN '{_sq(t)}' ELSE {best} END"
        )
        best_tf = (
            f"CASE WHEN {tf(t)} > {best_tf} THEN {tf(t)} ELSE {best_tf} END"
        )
    return f"""
        SELECT *,
               list_position(list_transform(toks, x -> lower(x)), best_term)
                   AS p,
               CASE WHEN p >= 1 AND p <= {title_tokens} THEN 1
                    ELSE greatest(1, p - {before}) END AS st,
               array_to_string(toks[st : st + {width} - 1], ' ') AS excerpt
        FROM (
            SELECT *, {best} AS best_term
            FROM (
                SELECT *,
                       list_filter(string_split({text_expr}, ' '),
                                   x -> x <> '') AS toks
                FROM __HITS__
            )
        )
    """


def blend_popularity(
    scored: DataFrame,
    ranks: DataFrame,
    alpha: float = 1.0,
    rank_doc_col: str = "doc",
    rank_col: str = "rank",
) -> DataFrame:
    """W4 + A5 at serve time: the reference folds the `index -R` PageRank
    into result ordering ([R:src/ranks.cpp] popularity weighting).
    Deterministic rule (SQL-mirrorable): score_pop = round(score · (1 +
    alpha · rank), 6), docs missing from ``ranks`` keep their text score
    (rank 0). ``ranks`` is doc-keyed and usually orders of magnitude
    smaller than the corpus after a top-N cut — Catalyst broadcasts it;
    ordering stays (score_pop desc, doc asc) deterministic."""
    r = ranks.select(
        F.col(rank_doc_col).alias("_rd"), F.col(rank_col).alias("_rv")
    )
    return (
        scored.join(r, scored["doc"] == r["_rd"], "left")
        .withColumn(
            "score_pop",
            F.round(
                F.col("score")
                * (F.lit(1.0) + F.lit(alpha) * F.coalesce("_rv", F.lit(0.0))),
                6,
            ),
        )
        .drop("_rd", "_rv")
    )


def rank_results(
    scored: DataFrame,
    docs_meta: DataFrame | None = None,
    site_col: str | None = None,
    clone_col: str | None = None,
    page: int = 0,
    page_size: int | None = 10,
) -> DataFrame:
    """W4: order by score desc (tie-break doc asc), optional one-best-per-
    site grouping (J9) and/or clone-group collapse (J5 at serve time — the
    reference groups mirror/clone docs in search output, keyed here by the
    crawl's content digest; a NULL digest keeps the doc its own group), and
    deterministic paging. Both groupings are the same row_number pattern —
    one shuffle each on a page-bound input.

    ``page_size=None`` returns the FULL collapsed result set ordered but
    unpaged — the page-arithmetic source: with grouping enabled, $(total)
    must count THIS set, not the ungrouped hits (round-5 ADVICE low)."""
    df = scored
    if docs_meta is not None and (site_col or clone_col):
        df = df.join(docs_meta, "doc")
        if clone_col is not None:
            key = F.coalesce(
                F.col(clone_col).cast("string"), F.col("doc").cast("string")
            )
            w = Window.partitionBy(key).orderBy(
                F.desc("score"), F.asc("doc")
            )
            df = df.withColumn("_rn", F.row_number().over(w)).filter(
                F.col("_rn") == 1
            ).drop("_rn")
        if site_col is not None:
            w = Window.partitionBy(site_col).orderBy(
                F.desc("score"), F.asc("doc")
            )
            df = df.withColumn("_rn", F.row_number().over(w)).filter(
                F.col("_rn") == 1
            ).drop("_rn")
    ordered = df.orderBy(F.desc("score"), F.asc("doc"))
    if page_size is None:
        return ordered
    if page > 0:
        return ordered.limit((page + 1) * page_size).offset(page * page_size)
    return ordered.limit(page_size)
