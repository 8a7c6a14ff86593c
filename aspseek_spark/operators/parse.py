"""Fetch-result parsing: text extraction + outlink emission (SURVEY.md §2.9).

One ``mapInPandas`` pass over the fetched batch does everything the
reference's parser does per page ([R:src/parser.cpp] semantics, quarantined
in functions/textextract.extract1):

  - MaxDocSize truncation (F6) before decode
  - byte-exact text extraction (golden-pinned)
  - content CRC32 + MD5 for clone/change detection (S5) — computed on the
    JVM side via built-ins, NOT here, to stay codegen'd
  - href extraction → resolution → canonicalization → config allow/deny
    filter (F1/F2) → MaxHops cutoff (F3), emitted as an array column that
    the caller explodes (UDTF-shaped: one page row in, N link rows out)

Everything crossing the Python boundary is Arrow-batched; the page ``html``
binary never enters a shuffle after this operator (SURVEY.md §4: column
pruning — drop html immediately after parse).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.textextract import (
    charset_from_content_type,
    extract_redirect,
    extract_text_and_hrefs,
    extract_title,
)
from ..functions.urlnorm import resolve_href

_PARSE_EXTRA = (
    "text_extracted string, outlinks array<string>, redirect_canon string, "
    "is_redirect boolean, title string"
)


def parse_fetched(df: DataFrame, config: CrawlConfig) -> DataFrame:
    """fetched pages (url_canon, html, depth, ...) → + text_extracted,
    outlinks (canonical, config-filtered, deduped in-page, document order
    irrelevant downstream — candidates are re-deduped per round), and
    redirect_canon (J4: meta-refresh target; a redirect page contributes no
    text and no ordinary outlinks — the target re-enters the pipeline at
    the parent's depth).
    """
    cfg_json = config.to_json()
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + _PARSE_EXTRA

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cfg = CrawlConfig.from_json(cfg_json)
        for pdf in batches:
            texts: list[str] = []
            links: list[list[str]] = []
            redirects: list[str | None] = []
            is_redir: list[bool] = []
            titles: list[str | None] = []
            # S7/F5 flags are precomputed JVM-side (crawl_round); absent
            # columns (operator used standalone) mean "parse everything"
            not_mod = (
                pdf["not_modified"] if "not_modified" in pdf
                else [False] * len(pdf)
            )
            mime_ok = (
                pdf["mime_ok"] if "mime_ok" in pdf else [True] * len(pdf)
            )
            ctypes = (
                pdf["content_type"] if "content_type" in pdf
                else [None] * len(pdf)
            )
            for url, html, depth, nm, mo, ct in zip(
                pdf["url_canon"], pdf["html"], pdf["depth"], not_mod,
                mime_ok, ctypes,
            ):
                if html is None or nm or not mo:
                    # miss (404) / not modified (304) / non-indexable MIME:
                    # nothing indexed, nothing discovered
                    texts.append(None)
                    links.append([])
                    redirects.append(None)
                    is_redir.append(False)
                    titles.append(None)
                    continue
                body = bytes(html)[: cfg.max_doc_size]
                target = extract_redirect(body)
                if target is not None:
                    # a meta-refresh page IS a redirect (status 302, oracle
                    # model_crawler.py:127 parity) even when the target is
                    # unresolvable or dropped by the config filter chain —
                    # only the candidate emission is nulled in that case
                    cu = resolve_href(url, target)
                    if cu is not None and not cfg.url_allowed(cu):
                        cu = None
                    texts.append(None)
                    links.append([])
                    redirects.append(cu)
                    is_redir.append(True)
                    titles.append(None)
                    continue
                # S6: HTTP-header charset (from Content-Type) takes
                # precedence over the page's meta tag
                cs = charset_from_content_type(ct)
                text, hrefs = extract_text_and_hrefs(body, cs)
                texts.append(text)
                redirects.append(None)
                is_redir.append(False)
                # W4 title zone: the REAL <title> text (same charset rules
                # as the body) — feeds SearchJob's zone index title tf
                titles.append(extract_title(body, cs))
                if depth is not None and depth + 1 > cfg.max_hops:
                    links.append([])
                    continue
                out: list[str] = []
                seen_local: set[str] = set()
                for href in hrefs:
                    cu = resolve_href(url, href)
                    if cu is None or cu in seen_local:
                        continue
                    if not cfg.url_allowed(cu):
                        continue
                    seen_local.add(cu)
                    out.append(cu)
                links.append(out)
            yield pdf.assign(
                text_extracted=texts, outlinks=links,
                redirect_canon=redirects, is_redirect=is_redir,
                title=titles,
            )

    return df.mapInPandas(_parse, schema=out_schema)


def with_content_digests(df: DataFrame, html_col: str = "html") -> DataFrame:
    """CRC32 + MD5 of page bytes — JVM built-ins (S5), codegen'd."""
    return df.withColumn("content_crc", F.crc32(F.col(html_col))).withColumn(
        "content_md5", F.md5(F.col(html_col))
    )


def validator_not_modified(etag, last_etag, last_modified, last_fetch_unix):
    """S7 conditional-GET validator selection as a pure Column expression
    (RFC 9110 §13.1.2): when the server sends an ETag AND one is stored,
    If-None-Match decides ALONE (etag equality — even if Last-Modified
    claims the page changed); otherwise fall back to If-Modified-Since.
    Shared by run_round's not_modified flag and the driver's q50 entry so
    the engine logic itself is what the DuckDB oracle checks."""
    return F.when(
        etag.isNotNull() & last_etag.isNotNull(), etag == last_etag
    ).otherwise(
        last_fetch_unix.isNotNull()
        & last_modified.isNotNull()
        & (last_modified <= last_fetch_unix)
    )
