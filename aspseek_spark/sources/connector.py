"""Live-fetch connector skeleton behind the SRC2 seam (SURVEY.md §2.1).

The crawl round's fetch step is an equi-join against the simulated ``pages``
corpus; the north-star architecture claims a live HTTP connector "slots in"
at that seam. This module PROVES the boundary: ``connector_fetcher`` has the
exact contract run_round expects (scheduled batch in → same rows + ``html``
binary out, misses as null html), implemented as an Arrow-batched
``mapInPandas`` over the batch — the shape a real HTTP fetcher would use
(per-partition connection pool, per-row GET).

No network exists in this sandbox, so the shipped transport is a mock over
an in-memory corpus dict; a production transport implements the same
two-method protocol with a requests/aiohttp session per partition. The
semantics the connector enforces (and the mock inherits):

  - MaxDocSize: bodies are truncated to config.max_doc_size at the
    transport boundary (the reference aborts the transfer at MaxDocSize,
    [R:src/http.cpp] semantics — truncation before parse is equivalent for
    indexing; parse truncates again defensively). The TRUNCATED body is the
    canonical document everywhere: run_round applies the same JVM-side
    substring on the simulated path before computing content_crc /
    content_md5, so clone detection (J5) and digest columns are identical
    regardless of which fetch path produced the row.
  - miss / connect error / timeout → html NULL (status 404 downstream,
    matching the simulated join's anti-join miss path).
  - per-host politeness is ALREADY enforced upstream by the scheduler
    (sched_unix spacing) — the connector never reorders its batch.

tests/test_connector.py swaps this in for the simulated join and asserts
the fetch order, statuses and extracted text are IDENTICAL to the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..config import CrawlConfig


class MockTransport:
    """Dict-backed transport: url_canon → (html bytes, content_type,
    last_modified[, etag]) — None entry / missing url = miss (connect
    error / 404).

    Pickled to executors (fine for fixtures); a live transport would
    instead open a connection pool lazily per partition.
    """

    def __init__(self, corpus: dict):
        self._corpus = corpus

    def fetch(self, url: str, max_bytes: int):
        """→ (body|None, content_type|None, last_modified|None, etag|None)."""
        v = self._corpus.get(url)
        if v is None:
            return None, None, None, None
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)[:max_bytes], None, None, None
        if len(v) == 3:
            body, ctype, lastmod = v
            return bytes(body)[:max_bytes], ctype, lastmod, None
        body, ctype, lastmod, etag = v
        return bytes(body)[:max_bytes], ctype, lastmod, etag


def connector_fetcher(transport, config: CrawlConfig):
    """Build the fetcher callable run_round accepts: scheduled batch
    DataFrame → same rows + html/content_type/last_modified columns
    (null html = miss)."""

    max_bytes = config.max_doc_size

    def _fetch(scheduled: DataFrame) -> DataFrame:
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in scheduled.schema.fields
        ) + (
            ", html binary, content_type string, last_modified long"
            ", etag string"
        )

        def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # a live transport would open its session/pool HERE, once per
            # partition, and close it after the iterator drains
            for pdf in batches:
                got = [transport.fetch(u, max_bytes) for u in pdf["url_canon"]]
                yield pdf.assign(
                    html=[g[0] for g in got],
                    content_type=[g[1] for g in got],
                    last_modified=pd.array(
                        [g[2] for g in got], dtype="Int64"
                    ),
                    etag=[g[3] for g in got],
                )

        return scheduled.mapInPandas(_op, schema=out_schema)

    return _fetch


def corpus_from_pages(pages_parquet: str) -> dict:
    """Load the synthetic corpus (with S7/F5 metadata when present) into
    the mock transport's dict."""
    import pyarrow.parquet as pq

    t = pq.read_table(pages_parquet)
    names = t.schema.names
    urls = t["url"].to_pylist()
    htmls = t["html"].to_pylist()
    if "content_type" in names and "last_modified" in names:
        etags = (
            t["etag"].to_pylist() if "etag" in names else [None] * len(urls)
        )
        return {
            u: (h, c, lm, e)
            for u, h, c, lm, e in zip(
                urls, htmls,
                t["content_type"].to_pylist(), t["last_modified"].to_pylist(),
                etags,
            )
        }
    return dict(zip(urls, htmls))
