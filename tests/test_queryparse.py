"""Search query language (s.cgi front end): parser unit tests, evaluator
parity with the individual §2.3/§2.7 operators, Spark-vs-DuckDB parity of
the generated oracle SQL (one AST, two backends), and the SearchJob
stored-index path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aspseek_spark.functions.queryparse import (
    And,
    Link,
    Not,
    Or,
    Phrase,
    QuerySyntaxError,
    Site,
    Term,
    parse_query,
    query_terms,
)
from aspseek_spark.operators.postings import (
    blend_popularity,
    build_postings,
    docs_with_all,
    docs_without,
    eval_query,
    phrase_match,
    phrase_match_n,
    query_oracle_sql,
)

# --- parser ----------------------------------------------------------------


def test_parser_precedence_and_forms():
    assert parse_query("a") == Term("a")
    assert parse_query("a & b") == And(Term("a"), Term("b"))
    assert parse_query("a b") == And(Term("a"), Term("b"))  # implicit AND
    # NOT > AND > OR
    assert parse_query("a | b & c") == Or(Term("a"), And(Term("b"), Term("c")))
    assert parse_query("(a | b) & c") == And(
        Or(Term("a"), Term("b")), Term("c")
    )
    assert parse_query("a & ~b") == And(Term("a"), Not(Term("b")))
    assert parse_query('"the table"') == Phrase(("the", "table"))
    assert parse_query('"solo"') == Term("solo")  # 1-word phrase = term
    assert parse_query("A & B") == And(Term("a"), Term("b"))  # lowercased
    assert query_terms(
        parse_query('("x y" | z) & ~w')
    ) == ["x", "y", "z", "w"]


def test_parser_site_link_modifiers():
    assert parse_query("site:h0.test") == Site("h0.test")
    assert parse_query("spark site:h0.test") == And(
        Term("spark"), Site("h0.test")
    )
    assert parse_query("link:http://h.test/p1 & spark") == And(
        Link("http://h.test/p1"), Term("spark")
    )
    # modifiers probe meta/links, not postings
    assert query_terms(parse_query("spark & site:h0.test")) == ["spark"]
    from aspseek_spark.functions.queryparse import After

    assert parse_query("spark after:1767225600") == And(
        Term("spark"), After(1767225600)
    )
    for bad in ("site:", "link:", "after:", "after:tomorrow"):
        with pytest.raises(QuerySyntaxError):
            parse_query(bad)


def test_parser_errors():
    for bad in ("", "   ", "(a", "a)", "a &", "& a", "a | |", '""'):
        with pytest.raises(QuerySyntaxError):
            parse_query(bad)


# --- evaluator -------------------------------------------------------------

DOCS_ROWS = [
    (1, "spark data engine spark"),
    (2, "data table query data data"),
    (3, "spark merge the table query"),
    (4, "the table query the table wins"),
    (5, "nothing relevant here"),
    (6, "spark data merge"),
]


@pytest.fixture(scope="module")
def qdocs(spark):
    return spark.createDataFrame(
        DOCS_ROWS, "doc_id long, text string"
    ).localCheckpoint()


@pytest.fixture(scope="module")
def qpost(spark, qdocs):
    return build_postings(qdocs, "doc_id", "text").localCheckpoint()


def _rows(df):
    return {(r["doc"], r["score"]) for r in df.collect()}


def test_eval_matches_individual_operators(qpost):
    # AND == docs_with_all (same doc set AND same summed-tf score)
    assert _rows(eval_query(qpost, parse_query("spark & data"))) == _rows(
        docs_with_all(qpost, ["spark", "data"])
    )
    # AND NOT == docs_without
    assert _rows(eval_query(qpost, parse_query("spark & ~merge"))) == _rows(
        docs_without(docs_with_all(qpost, ["spark"]), qpost, "merge")
    )
    # 2-word phrase doc set == phrase_match
    got = eval_query(qpost, parse_query('"the table"'))
    assert {r["doc"] for r in got.collect()} == {
        r["doc"] for r in phrase_match(qpost, "the", "table").collect()
    }
    # phrase score counts occurrences: doc 4 has 'the table' twice
    assert dict(_rows(got))[4] == 2


def test_eval_three_word_phrase(qpost):
    got = _rows(eval_query(qpost, parse_query('"the table query"')))
    # docs 3 and 4 contain the exact trigram once each; doc 2 has the
    # bigram 'table query' but not the trigram
    assert got == {(3, 1), (4, 1)}
    assert _rows(phrase_match_n(qpost, ["the", "table", "query"])) == got


def test_eval_or_scores_sum(qpost):
    got = dict(_rows(eval_query(qpost, parse_query("spark | data"))))
    # doc 1: spark tf 2 + data tf 1 = 3; doc 2: data tf 3
    assert got[1] == 3 and got[2] == 3 and got[6] == 2


def test_eval_rejects_unbounded(qpost):
    for q in ("~spark", "~(a & b)", "a | ~b"):
        with pytest.raises(ValueError):
            eval_query(qpost, parse_query(q))


def test_eval_double_negation(qpost):
    assert _rows(eval_query(qpost, parse_query("~~spark"))) == _rows(
        eval_query(qpost, parse_query("spark"))
    )


QUERIES_FOR_PARITY = [
    "spark",
    "spark & data",
    "spark data",
    "spark | table",
    "(spark | table) & data",
    "spark & ~merge",
    '"the table"',
    '"the table query"',
    '("the table" | query) & ~wins',
    "~~spark & data",
]


def test_eval_matches_duckdb_oracle(spark, qdocs, qpost):
    """The strong gate: for every query shape, eval_query on Spark equals
    query_oracle_sql on DuckDB over the same rows — one AST, two backends."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {t!r})" for i, t in DOCS_ROWS)
        + ") v(doc_id, text)"
    )
    for q in QUERIES_FOR_PARITY:
        ast = parse_query(q)
        got = _rows(eval_query(qpost, ast))
        want = set(
            (d, s)
            for d, s in con.execute(query_oracle_sql(ast)).fetchall()
        )
        assert got == want, q


def test_random_queries_match_duckdb_oracle(spark, qdocs, qpost):
    """Property test: RANDOM well-formed boolean queries over the fixed
    vocabulary — Spark eval_query and the generated DuckDB oracle must
    agree on (doc, score) for every shape the grammar can produce
    (bounded depth; negative-only shapes are skipped on both sides
    identically). Deterministic seed: same 25 queries every run."""
    import random

    import duckdb

    vocab = ["spark", "data", "table", "query", "merge", "the", "wins",
             "nothing", "engine", "absent"]
    rng = random.Random(20260817)

    def gen(depth: int) -> str:
        r = rng.random()
        if depth >= 3 or r < 0.45:
            if rng.random() < 0.2:
                n = rng.randint(2, 3)
                return '"' + " ".join(rng.choice(vocab) for _ in range(n)) + '"'
            return rng.choice(vocab)
        if r < 0.65:
            return f"({gen(depth + 1)} & {gen(depth + 1)})"
        if r < 0.8:
            return f"({gen(depth + 1)} | {gen(depth + 1)})"
        if r < 0.9:
            return f"({gen(depth + 1)} & ~{gen(depth + 1)})"
        return f"~~{gen(depth + 1)}"

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {t!r})" for i, t in DOCS_ROWS)
        + ") v(doc_id, text)"
    )
    checked = 0
    for _ in range(25):
        q = gen(0)
        ast = parse_query(q)
        try:
            got = _rows(eval_query(qpost, ast))
        except ValueError:
            # unbounded (negative-only / OR-over-negated) — the oracle
            # generator must refuse the SAME shapes
            with pytest.raises(ValueError):
                query_oracle_sql(ast)
            continue
        want = set(con.execute(query_oracle_sql(ast)).fetchall())
        assert got == want, q
        checked += 1
    assert checked >= 12, f"only {checked} evaluable queries generated"


def test_oracle_sql_escapes_apostrophes(spark):
    """Round-4 ADVICE: the tokenizer allows apostrophes in words, so the
    oracle generators must escape them — `o'brien` (term, phrase, and
    site:) must produce VALID DuckDB SQL that matches the Spark evaluator,
    not an injectable/broken literal."""
    import duckdb

    from aspseek_spark.operators.postings import excerpt_oracle_sql

    rows = [
        (1, "o'brien wrote the d'arcy report"),
        (2, "nothing here"),
        (3, "the d'arcy o'brien case"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    post = build_postings(docs, "doc_id", "text")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join("({}, '{}')".format(i, t.replace("'", "''")) for i, t in rows)
        + ") v(doc_id, text)"
    )
    for q in ("o'brien", "\"d'arcy o'brien\"", "o'brien & ~report",
              "site:o'host | o'brien"):
        ast = parse_query(q)
        got = _rows(
            eval_query(
                post, ast,
                site_of=docs.selectExpr("doc_id AS doc", "'x' AS site"),
            )
        )
        want = {
            (d, s)
            for d, s in con.execute(
                query_oracle_sql(ast, site_col="'x'")
            ).fetchall()
        }
        assert got == want, q
    # the excerpt generator escapes too (it interpolates sorted terms)
    frag = excerpt_oracle_sql(["o'brien", "report"]).replace(
        "__HITS__",
        "(SELECT doc_id, text FROM documents WHERE doc_id = 1)",
    )
    out = con.execute(
        f"SELECT best_term, excerpt FROM ({frag})"
    ).fetchall()
    assert out[0][0] == "o'brien"


def test_eval_site_and_link_filters(spark, qdocs, qpost):
    # docs 1-3 on site a.test, 4-6 on b.test
    site_of = spark.createDataFrame(
        [(i, "a.test" if i <= 3 else "b.test") for i in range(1, 7)],
        "doc long, site string",
    )
    # link graph: docs 1 and 5 link to u1; doc 2 links to u2
    links_to = spark.createDataFrame(
        [(1, "http://t.test/u1"), (5, "http://t.test/u1"),
         (2, "http://t.test/u2"), (5, "http://t.test/u1")],
        "doc long, target string",
    )
    # site filter restricts, text score unchanged (+0)
    got = _rows(
        eval_query(qpost, parse_query("spark site:a.test"), site_of=site_of)
    )
    base = dict(_rows(eval_query(qpost, parse_query("spark"))))
    assert got == {(d, s) for d, s in base.items() if d <= 3}
    # pure site query: every doc of the site, score 0
    assert _rows(
        eval_query(qpost, parse_query("site:b.test"), site_of=site_of)
    ) == {(4, 0), (5, 0), (6, 0)}
    # link filter (deduped), composes with terms
    got = _rows(
        eval_query(
            qpost,
            parse_query("link:http://t.test/u1 & spark"),
            links_to=links_to,
        )
    )
    assert got == {(1, base[1])}
    # missing tables raise
    with pytest.raises(ValueError):
        eval_query(qpost, parse_query("site:a.test"))
    with pytest.raises(ValueError):
        eval_query(qpost, parse_query("link:x"))


def test_eval_after_filter(spark, qpost):
    """`after:` date limit (s.cgi time-limit analog): score-neutral filter
    over the docs' latest fetch time, engine + generated DuckDB oracle."""
    import duckdb

    fetched_at = spark.createDataFrame(
        [(i, 100 + i * 10) for i in range(1, 7)], "doc long, fetched_unix long"
    )
    got = _rows(
        eval_query(
            qpost, parse_query("spark after:140"), fetched_at=fetched_at
        )
    )
    base = dict(_rows(eval_query(qpost, parse_query("spark"))))
    # docs 4..6 pass the time bar; of those, spark hits 6 only (plus 4/5 if
    # they contain spark — compute from base)
    assert got == {(d, s) for d, s in base.items() if 100 + d * 10 >= 140}
    with pytest.raises(ValueError):
        eval_query(qpost, parse_query("after:1"))

    # oracle parity with time_col over an inline table
    rows = [(1, 100, "spark x"), (2, 150, "spark y"), (3, 200, "z")]
    docs = spark.createDataFrame(
        rows, "doc_id long, fts long, text string"
    )
    post = build_postings(docs, "doc_id", "text")
    fa = docs.select(F.col("doc_id").alias("doc"), F.col("fts").alias("fetched_unix"))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {t}, {x!r})" for i, t, x in rows)
        + ") v(doc_id, fts, text)"
    )
    ast = parse_query("spark after:150")
    got = _rows(eval_query(post, ast, fetched_at=fa))
    want = set(
        con.execute(query_oracle_sql(ast, time_col="fts")).fetchall()
    )
    assert got == want == {(2, 1)}


def test_eval_before_filter_and_range(spark, qpost):
    """`before:` (strictly-before) completes the s.cgi date-RANGE pair:
    `after:a & before:b` is half-open [a, b) — no boundary double-count;
    engine + generated DuckDB oracle from the same parse."""
    import duckdb

    from aspseek_spark.functions.queryparse import Before

    assert parse_query("before:99") == Before(99)
    with pytest.raises(QuerySyntaxError):
        parse_query("before:notanumber")
    fetched_at = spark.createDataFrame(
        [(i, 100 + i * 10) for i in range(1, 7)], "doc long, fetched_unix long"
    )
    base = dict(_rows(eval_query(qpost, parse_query("spark"))))
    got = _rows(
        eval_query(
            qpost, parse_query("spark before:140"), fetched_at=fetched_at
        )
    )
    assert got == {(d, s) for d, s in base.items() if 100 + d * 10 < 140}
    # half-open range: boundary doc (fetched_unix == 140) is in after: only
    rng = _rows(
        eval_query(
            qpost, parse_query("spark & after:130 & before:140"),
            fetched_at=fetched_at,
        )
    )
    assert rng == {(d, s) for d, s in base.items() if d * 10 + 100 == 130}
    with pytest.raises(ValueError):  # missing fetched_at table
        eval_query(qpost, parse_query("before:1"))

    # oracle parity from the same parse
    rows = [(1, 100, "spark x"), (2, 150, "spark y"), (3, 200, "spark z")]
    docs = spark.createDataFrame(rows, "doc_id long, fts long, text string")
    post = build_postings(docs, "doc_id", "text")
    fa = docs.select(
        F.col("doc_id").alias("doc"), F.col("fts").alias("fetched_unix")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {t}, {x!r})" for i, t, x in rows)
        + ") v(doc_id, fts, text)"
    )
    ast = parse_query("spark & after:100 & before:200")
    got = _rows(eval_query(post, ast, fetched_at=fa))
    want = set(
        con.execute(query_oracle_sql(ast, time_col="fts")).fetchall()
    )
    assert got == want == {(1, 1), (2, 1)}


def test_search_job_after_filter(spark, tmp_path_factory):
    """SearchJob serves after: from the stored-text table's fetch stamp;
    a merge refreshes the stamp (revisited doc passes a later bar)."""
    from aspseek_spark.plans.search_job import SearchJob

    rows = [
        (1, f"http://h.test/p{i}", i, "h.test", 1, 200, "spark data", 1000 + i)
        for i in range(4)
    ]
    fetched = spark.createDataFrame(
        rows,
        "round int, url_canon string, url_hash64 long, host string, "
        "depth int, status int, text string, sched_unix long",
    )
    job = SearchJob(
        spark, str(tmp_path_factory.mktemp("after_idx")), n_buckets=4
    )
    job.build_from_fetched(fetched)
    assert {r["doc"] for r in job.search_query("spark after:1002").collect()} == {2, 3}
    # revisit doc 0 later: it now passes the bar
    delta = spark.createDataFrame(
        [(2, "http://h.test/p0", 0, "h.test", 1, 200, "spark fresh", 2000)],
        "round int, url_canon string, url_hash64 long, host string, "
        "depth int, status int, text string, sched_unix long",
    )
    job.merge_delta(delta)
    assert {r["doc"] for r in job.search_query("spark after:1002").collect()} == {0, 2, 3}


def test_site_filter_matches_duckdb_oracle(spark):
    import duckdb

    rows = [
        (1, "src0", "spark data table"),
        (2, "src0", "spark spark query"),
        (3, "src1", "spark data"),
        (4, "src1", "table query data"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    post = build_postings(docs, "doc_id", "text")
    site_of = docs.select(
        F.col("doc_id").alias("doc"), F.col("source").alias("site")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {s!r}, {t!r})" for i, s, t in rows)
        + ") v(doc_id, source, text)"
    )
    for q in ("spark & site:src0", "site:src1", "(spark | table) site:src1"):
        ast = parse_query(q)
        got = _rows(eval_query(post, ast, site_of=site_of))
        want = set(
            con.execute(query_oracle_sql(ast, site_col="source")).fetchall()
        )
        assert got == want, q


def test_blend_popularity(spark, qpost):
    """Reference search-time popularity weighting: score_pop = round(score
    · (1 + α·rank), 6); unranked docs keep the text score."""
    scored = eval_query(qpost, parse_query("spark | data"))
    base = dict(_rows(scored))
    ranks = spark.createDataFrame(
        [(1, 0.5), (2, 0.25)], "doc long, rank double"
    )
    got = {
        r["doc"]: r["score_pop"]
        for r in blend_popularity(scored, ranks, alpha=2.0).collect()
    }
    assert got[1] == round(base[1] * (1 + 2.0 * 0.5), 6)
    assert got[2] == round(base[2] * (1 + 2.0 * 0.25), 6)
    for d in base:
        if d not in (1, 2):
            assert got[d] == float(base[d])  # rank 0 → unchanged


def test_search_job_query_language(spark, qdocs, tmp_path_factory):
    """SearchJob.search_query (stored, bucket-pruned index) returns the
    inline eval_query answer for every parity query."""
    from aspseek_spark.plans.search_job import SearchJob

    fetched = qdocs.select(
        F.lit(1).alias("round"),
        F.concat(F.lit("http://h.test/p"), "doc_id").alias("url_canon"),
        F.col("doc_id").alias("url_hash64"),
        F.lit("h.test").alias("host"),
        F.lit(1).alias("depth"),
        F.lit(200).alias("status"),
        "text",
    )
    job = SearchJob(
        spark, str(tmp_path_factory.mktemp("qlang_idx")), n_buckets=8
    )
    job.build_from_fetched(fetched)
    qpost_inline = build_postings(qdocs, "doc_id", "text")
    for q in QUERIES_FOR_PARITY:
        got = _rows(job.search_query(q))
        want = _rows(eval_query(qpost_inline, parse_query(q)))
        assert got == want, q
    # the qcache front: repeated query string (different spelling) hits
    r1 = job.search_cached("query", "spark&data")
    r2 = job.search_cached("query", "spark  &  data")
    assert r2 is r1
    # site: resolves against the stored-text table's host column
    assert _rows(job.search_query("spark & site:h.test")) == _rows(
        eval_query(qpost_inline, parse_query("spark"))
    )
    assert _rows(job.search_query("spark & site:other.test")) == set()
