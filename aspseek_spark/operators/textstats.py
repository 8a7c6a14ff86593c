"""Text-analysis operators for a training-data pipeline (driver brief):

language ID (n-gram/stopword heuristic), quality scoring, token counting,
document fingerprinting. All pure Spark column expressions (JVM-side,
whole-stage codegen) — no Python in the hot path — so each is SQL-oracle
checkable and scales linearly with a single parquet scan, no shuffle.

Capability framing vs the reference: ASPseek's parser/word pipeline
(tokenize, stopword filter — [R:src/words.cpp], [R:src/stopwords.cpp])
provides the same token/stopword machinery; these operators re-express it
plus the modern pipeline metrics over the ``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny fixed stopword sets per language — enough signal for a heuristic
# language ID over synthetic corpora; real deployments swap in full lists.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de"],
}


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokenization (reference tokenizer S9 analog)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token + char counts (BPE-ish proxy: chars/4 heuristic)."""
    return df.withColumn("n_tokens", F.size(tokens_col(text_col))).withColumn(
        "n_chars_measured", F.length(text_col)
    ).withColumn(
        "approx_bpe_tokens", (F.length(text_col) / F.lit(4)).cast("long")
    )


def stopword_ratio(lang: str, text_col: str = "text") -> Column:
    """Fraction of tokens that are stopwords of ``lang`` (codegen'd)."""
    toks = tokens_col(text_col)
    hits = F.filter(
        toks, lambda t: F.lower(t).isin(*STOPWORDS[lang])
    )
    return F.when(F.size(toks) > 0, F.size(hits) / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punct/stopword quality heuristics + a composite score —
    the standard pre-training corpus filters (Gopher/C4-style rules)."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    mean_word_len = F.when(
        n_tok > 0,
        F.aggregate(
            F.transform(toks, F.length), F.lit(0.0), lambda a, x: a + x
        )
        / n_tok,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.length(text_col) > 0,
        F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
        / F.length(text_col),
    ).otherwise(F.lit(0.0))
    sw_ratio = stopword_ratio("en", text_col)
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
        * F.when((mean_word_len >= 2) & (mean_word_len <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
        * F.when(punct_ratio < 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio_en", sw_ratio)
        .withColumn("quality_pass", score.cast("int"))
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit ratio.
    Ties / all-zero → 'und'. Deterministic: ties break by language order."""
    ratios = {lang: stopword_ratio(lang, text_col) for lang in STOPWORDS}
    best_lang = F.lit("und")
    best_r = F.lit(0.0)
    for lang in sorted(STOPWORDS):  # fixed order → deterministic tie-break
        r = ratios[lang]
        cond = r > best_r
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_r = F.when(cond, r).otherwise(best_r)
    return df.withColumn("lang_pred", best_lang).withColumn(
        "lang_pred_score", best_r
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-content md5/crc32 (reference S5 clone
    keys) + a shingle fingerprint = md5 of the sorted distinct 3-word
    shingles (order-insensitive near-dup key, rolling-hash analog)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    shingles = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2),
                F.element_at(toks, i + 3)
            ),
        ),
    ).otherwise(F.array(F.col(text_col)))
    return (
        df.withColumn("md5_full", F.md5(F.col(text_col)))
        .withColumn("crc32_full", F.crc32(F.col(text_col).cast("binary")))
        .withColumn(
            "shingle_fp",
            F.md5(F.concat_ws("\x01", F.array_sort(F.array_distinct(shingles)))),
        )
    )
