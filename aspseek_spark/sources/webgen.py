"""Deterministic synthetic Common-Crawl-style web (FIXTURES.md family A).

Generates the three fixture tables the crawl engine + oracle both consume:

  pages(url, warc_ts, html, text, lang)   — input_hint shape, BASELINE.json:16
  seeds(url)
  robots_src(host, body)

Everything is seeded (numpy PCG64, seed=42 by default) and wall-clock free
(timestamps derive from the fixed epoch 2026-01-01T00:00:00Z), so every run
produces byte-identical parquet. Host sizes follow a zipf(a=1.3)-style skew
so one hot host exercises salting + AQE skew handling (SURVEY.md §4).

The ``text`` column is the golden extracted text — computed at generation
time by the same ``extract1`` the engine runs, making the byte-identical
invariant checkable end to end.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import EPOCH_UNIX
from ..functions.textextract import extract1

_LANGS = ["en", "de", "fr", "es", "cs"]
_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega search engine "
    "crawler frontier politeness robots index page host link anchor"
).split()


@dataclass
class WebSpec:
    n_pages: int = 1000
    seed: int = 42
    mean_outlinks: int = 8
    dup_frac: float = 0.05  # pages sharing identical body (clone detection)
    dead_frac: float = 0.06  # hrefs pointing at non-existent pages (404 path)
    private_frac: float = 0.15  # pages living under /private/ (robots target)
    disallow_private_frac: float = 0.20  # hosts whose robots deny /private/
    disallow_all_frac: float = 0.02  # hosts whose robots deny everything
    seed_hosts_frac: float = 0.08  # hosts whose root URL is a crawl seed
    redirect_frac: float = 0.03  # meta-refresh redirect pages (J4/F7 path)
    latin1_frac: float = 0.03  # iso-8859-1 pages (S6 charset conversion)
    # body length in words. 40 ≈ 1 KB pages (fast unit-test webs); the
    # BENCH web uses thousands (real web pages are 10-100 KB of HTML —
    # Common Crawl mean ≈ 60 KB) so per-round parallel work is realistic
    # relative to fixed coordination cost.
    body_words: int = 40
    # i-based (rng-free → adding these NEVER perturbs the rng stream):
    # every 37th page is non-HTML (F5 MIME filter path); every 11th page
    # advertises a far-future Last-Modified (always re-fetched on revisit),
    # the rest are stale (304 on revisit) — S7 conditional-GET path; every
    # 53rd ordinary page is windows-1251 Cyrillic (S6 charset conversion).
    nonhtml_every: int = 37
    fresh_every: int = 11
    win1251_every: int = 53
    # S7 ETag: pages i % noetag_every == 1 send NO ETag (Last-Modified
    # fallback path); the rest send a stable content-derived ETag. A page
    # that is both fresh_every (LM says modified) AND etagged exercises the
    # RFC 9110 precedence: If-None-Match wins → 304 despite Last-Modified.
    noetag_every: int = 3


def _page_url(host: str, host_page_idx: int, rng: np.random.Generator) -> str:
    r = rng.integers(0, 10)
    if host_page_idx == 0:
        return f"http://{host}/"
    if r < 5:
        return f"http://{host}/p{host_page_idx}.html"
    if r < 7:
        return f"http://{host}/dir{int(rng.integers(1, 4))}/p{host_page_idx}.html"
    if r < 8:
        return f"http://{host}/private/p{host_page_idx}.html"
    if r < 9:
        return f"http://{host}/p{host_page_idx}.html?ref={int(rng.integers(0, 5))}"
    return f"http://{host}/dir1/sub/p{host_page_idx}.html"


def _messy_variant(url: str, rng: np.random.Generator) -> str:
    """Emit a non-canonical variant that canon1 maps back to ``url``."""
    r = rng.integers(0, 6)
    scheme, rest = url.split("://", 1)
    host, _, path = rest.partition("/")
    path = "/" + path
    if r == 0:
        return f"{scheme}://{host.upper()}{path}"
    if r == 1:
        return f"{scheme}://{host}:80{path}"
    if r == 2:
        return f"{url}#frag{int(rng.integers(0, 9))}"
    if r == 3 and path.count("/") >= 2:
        first, _, rem = path[1:].partition("/")
        return f"{scheme}://{host}/{first}/../{first}/{rem}"
    if r == 4:
        return url.replace("p", "%70", 1) if "/p" in path else url
    return url

_WORDS_ARR = np.asarray(_WORDS, dtype=object)


def _extract_texts(htmls: list[bytes], pool) -> list[str]:
    """``extract1`` over a batch, order-preserving; parallel when a pool is
    given. extract1 is a pure function of the html bytes — the rng never
    enters here — so process fan-out cannot perturb the fixture."""
    if pool is None:
        return [extract1(h) for h in htmls]
    return pool.map(extract1, htmls, chunksize=max(1, len(htmls) // 64))


def _generate_stream(spec: WebSpec, chunk_rows: int, pool=None):
    """One sequential rng pass over the web — IDENTICAL draw order to the
    original whole-table builder (content-hash-verified in
    tests/test_webgen_stream.py) — yielded as ``("pages", chunk_table)``
    every ``chunk_rows`` pages, then ``("seeds", t)`` and
    ``("robots_src", t)``.

    Streaming bounds peak memory at one chunk instead of the whole corpus:
    the scaling fixture at realistic Common-Crawl page sizes (300k pages ×
    ~74 KB html) is ~40 GB as a single in-memory table, which the old
    builder materialized twice (python lists + arrow buffers)."""
    rng = np.random.default_rng(np.random.PCG64(spec.seed))
    n = spec.n_pages
    n_hosts = max(4, n // 50)
    hosts = [f"h{i:04d}.test" for i in range(n_hosts)]

    # zipf-style host weights (rank^-1.3, normalized) → skewed page counts
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    weights = ranks ** -1.3
    weights /= weights.sum()
    host_of_page = rng.choice(n_hosts, size=n, p=weights)

    # per-host page index (deterministic order: page id ascending)
    host_counters = np.zeros(n_hosts, dtype=np.int64)
    urls: list[str] = []
    page_hosts: list[str] = []
    for pid in range(n):
        h = int(host_of_page[pid])
        urls.append(_page_url(hosts[h], int(host_counters[h]), rng))
        page_hosts.append(hosts[h])
        host_counters[h] += 1
    # URL collisions possible only via rng path reuse — dedupe keeping first
    seen_u: dict[str, int] = {}
    keep = []
    for i, u in enumerate(urls):
        if u not in seen_u:
            seen_u[u] = i
            keep.append(i)
    urls = [urls[i] for i in keep]
    page_hosts = [page_hosts[i] for i in keep]
    n = len(urls)
    by_host: dict[str, list[int]] = {}
    for i, h in enumerate(page_hosts):
        by_host.setdefault(h, []).append(i)

    # duplicate-content groups
    n_dup = int(n * spec.dup_frac)
    dup_source = rng.integers(0, n, size=n_dup)

    # bodies + links — buffered per chunk, flushed as arrow tables
    htmls: list[bytes] = []
    langs: list[str] = []
    warc_ts: list[int] = []
    content_types: list[str] = []
    last_modified: list[int] = []
    etags: list[str | None] = []
    chunk_start = 0
    body_cache: dict[int, str] = {}

    def _flush(end: int):
        nonlocal chunk_start
        if end == chunk_start:
            return None
        texts = _extract_texts(htmls, pool)
        tbl = pa.table(
            {
                "url": pa.array(urls[chunk_start:end], pa.string()),
                "warc_ts": pa.array(warc_ts, pa.timestamp("us", tz="UTC")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "content_type": pa.array(content_types, pa.string()),
                "last_modified": pa.array(last_modified, pa.int64()),
                "etag": pa.array(etags, pa.string()),
            }
        )
        for buf in (htmls, langs, warc_ts, content_types, last_modified,
                    etags):
            buf.clear()
        chunk_start = end
        return tbl

    for i in range(n):
        host = page_hosts[i]
        same = by_host[host]
        k = int(rng.poisson(spec.mean_outlinks))
        hrefs: list[str] = []
        for _ in range(k):
            r = rng.random()
            if r < 0.55 and len(same) > 1:  # same-host link, often relative
                tgt = urls[same[int(rng.integers(0, len(same)))]]
                tpath = tgt.split(host, 1)[1]
                style = rng.integers(0, 3)
                if style == 0:
                    hrefs.append(tpath)  # absolute-path href
                elif style == 1:
                    hrefs.append(tpath.lstrip("/") or "./")  # relative
                else:
                    hrefs.append(_messy_variant(tgt, rng))
            elif r < 0.55 + spec.dead_frac:
                hrefs.append(
                    f"http://{host}/missing{int(rng.integers(0, 10**6))}.html"
                )
            else:  # cross-host absolute
                tgt = urls[int(rng.integers(0, n))]
                hrefs.append(_messy_variant(tgt, rng))
        anchors = "\n".join(
            f'<a href="{h}">link {j}</a>' for j, h in enumerate(hrefs)
        )
        # one body draw per page, ALWAYS (the original drew inside a
        # setdefault argument, which evaluates unconditionally — preserving
        # the draw keeps the rng stream byte-identical for dup pages too)
        draw = rng.integers(0, len(_WORDS), spec.body_words)
        if i < n_dup:
            src = int(dup_source[i])
            if src not in body_cache:
                body_cache[src] = " ".join(_WORDS_ARR[draw])
            body_words = body_cache[src]
        else:
            body_words = " ".join(_WORDS_ARR[draw])
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        kind = rng.random()
        if kind < spec.redirect_frac and n > 1:
            # meta-refresh redirect page (J4/F7): target is another page
            tgt = urls[int(rng.integers(0, n))]
            html = (
                f"<html><head><title>Moved {i}</title>\n"
                f'<meta http-equiv="refresh" content="0;url={tgt}">\n'
                f"</head><body>Redirecting to new location</body></html>"
            ).encode("utf-8")
        elif kind < spec.redirect_frac + spec.latin1_frac:
            # iso-8859-1 page (S6 charset sniff path): é as 0xE9 byte
            html = (
                f"<html><head><title>Café {i}</title>\n"
                f'<meta http-equiv="Content-Type" '
                f'content="text/html; charset=iso-8859-1"></head>\n'
                f"<body><p>Résumé naïve café — {body_words}</p>\n"
                f"{anchors}\n</body></html>"
            ).encode("iso-8859-1", errors="replace")
        elif spec.win1251_every and i % spec.win1251_every == 11:
            # S6: Cyrillic page in windows-1251 with a correct meta charset
            # (i-based branch on the no-extra-draw path: rng stream intact)
            html = (
                f"<html><head><title>Страница {i}</title>\n"
                f'<meta http-equiv="Content-Type" '
                f'content="text/html; charset=windows-1251"></head>\n'
                f"<body><p>Тест кодировки — {body_words}</p>\n{anchors}\n"
                f"</body></html>"
            ).encode("windows-1251", errors="replace")
        else:
            html = (
                f"<html><head><title>Page {i} &amp; co</title>\n"
                f'<meta name="description" content="synthetic page {i}">\n'
                f"<style>.x{{color:red}}</style></head>\n"
                f"<body><!-- comment {i} -->\n"
                f"<script>var hidden={i};</script>\n"
                f"<h1>Heading &#69;{i}</h1>\n<p>{body_words}</p>\n{anchors}\n"
                f"</body></html>"
            ).encode("utf-8")
        htmls.append(html)
        langs.append(lang)
        warc_ts.append((EPOCH_UNIX - 86400 * 30 + i * 7) * 1_000_000)
        # S7/F5 metadata — i-based, NO rng draws (existing bytes unchanged)
        content_types.append(
            "application/octet-stream"
            if spec.nonhtml_every and i % spec.nonhtml_every == 5
            else "text/html"
        )
        last_modified.append(
            EPOCH_UNIX + 10 * 365 * 86400  # always-modified ("fresh") page
            if spec.fresh_every and i % spec.fresh_every == 7
            else EPOCH_UNIX - 86400 * 30 + i * 7  # stale: 304 on revisit
        )
        etags.append(
            None
            if spec.noetag_every and i % spec.noetag_every == 1
            else f'"{i:x}-{len(html):x}"'  # stable strong validator
        )
        if (i + 1) % chunk_rows == 0:
            tbl = _flush(i + 1)
            if tbl is not None:
                yield "pages", tbl
    tbl = _flush(n)
    if tbl is not None:
        yield "pages", tbl

    # robots bodies
    r_hosts: list[str] = []
    r_bodies: list[bytes] = []
    draw = rng.random(n_hosts)
    for hi, host in enumerate(hosts):
        if draw[hi] < spec.disallow_all_frac:
            body = b"User-agent: *\nDisallow: /\n"
        elif draw[hi] < spec.disallow_all_frac + spec.disallow_private_frac:
            body = (
                b"# synthetic robots\nUser-agent: repo-bot\n"
                b"Disallow: /private/\nAllow: /private/open/\n\n"
                b"User-agent: *\nDisallow: /dir2/\n"
            )
        else:
            body = b"User-agent: *\nDisallow:\n"
        r_hosts.append(host)
        r_bodies.append(body)

    # seeds: roots of the first seed_hosts_frac hosts (includes hot host 0)
    n_seed_hosts = max(2, int(n_hosts * spec.seed_hosts_frac))
    seed_urls = [
        f"http://{h}/" for h in hosts[:n_seed_hosts] if f"http://{h}/" in seen_u
    ]
    yield "seeds", pa.table({"url": pa.array(seed_urls, pa.string())})
    yield "robots_src", pa.table(
        {
            "host": pa.array(r_hosts, pa.string()),
            "body": pa.array(r_bodies, pa.binary()),
        }
    )


def _make_pool(spec: WebSpec):
    """A fork Pool for the text-extraction fan-out, or None for small webs
    (where pool start-up would dominate and serial output is identical)."""
    if spec.n_pages * max(spec.body_words, 40) < 20_000_000:
        return None
    import multiprocessing as mp

    try:
        return mp.get_context("fork").Pool(min(24, os.cpu_count() or 4))
    except (OSError, ValueError):
        return None


def _est_row_bytes(spec: WebSpec) -> int:
    """Raw bytes/page estimate for chunk/row-group sizing: html + golden
    text are each ~6.5 bytes/word, plus anchors/head boilerplate."""
    return spec.body_words * 13 + 900


def generate_web(spec: WebSpec) -> dict[str, pa.Table]:
    pool = _make_pool(spec)
    try:
        tables: dict[str, pa.Table] = {}
        chunks: list[pa.Table] = []
        chunk_rows = max(256, (64 << 20) // _est_row_bytes(spec))
        for name, tbl in _generate_stream(spec, chunk_rows, pool):
            if name == "pages":
                chunks.append(tbl)
            else:
                tables[name] = tbl
        tables["pages"] = (
            chunks[0] if len(chunks) == 1 else pa.concat_tables(chunks)
        )
        return tables
    finally:
        if pool is not None:
            pool.close()


def _group_rows(tbl: pa.Table) -> int:
    rows = max(1, tbl.num_rows)
    avg_row = max(1, tbl.nbytes // rows)
    return max(64, min(1 << 20, (32 << 20) // avg_row))


def write_web(out_dir: str, spec: WebSpec) -> dict[str, str]:
    """Write the three fixture parquets; returns name→path. Idempotent.

    Row groups are sized to ~32 MB: pyarrow's default (1M rows/group) puts
    the ENTIRE corpus in one row group, and Spark assigns a row group to a
    single input split — a 3.3 GB single-group file made every scan (and
    the whole fetch→parse pipeline above it) run as ONE task regardless of
    cluster size. Splittable row groups are what makes the pages side
    scan-parallel, exactly like a production WARC/Iceberg layout.

    The pages table streams through a ParquetWriter chunk by chunk (one
    sequential generation pass, peak memory = one chunk), so scaling webs
    at realistic page sizes never materialize the multi-GB corpus."""
    os.makedirs(out_dir, exist_ok=True)
    pool = _make_pool(spec)
    paths: dict[str, str] = {}
    writer: pq.ParquetWriter | None = None
    group_rows: int | None = None
    try:
        chunk_rows = max(256, (64 << 20) // _est_row_bytes(spec))
        for name, tbl in _generate_stream(spec, chunk_rows, pool):
            path = os.path.join(out_dir, f"{name}.parquet")
            if name == "pages":
                if writer is None:
                    writer = pq.ParquetWriter(path, tbl.schema)
                    group_rows = _group_rows(tbl)
                    paths[name] = path
                writer.write_table(tbl, row_group_size=group_rows)
            else:
                pq.write_table(tbl, path, row_group_size=_group_rows(tbl))
                paths[name] = path
    finally:
        if writer is not None:
            writer.close()
        if pool is not None:
            pool.close()
    return paths
