"""Streaming webgen must be draw-for-draw identical to the original
whole-table builder.

The pinned hashes below were computed from the PRE-streaming builder
(commit 5678517) over every column of all three tables — the streaming
rewrite (chunked flushes + pooled extract1 + vectorized body join) must
reproduce them exactly, or every golden crawl fixture in the suite shifts.
"""

import hashlib

import pyarrow as pa

from aspseek_spark.sources.webgen import WebSpec, _generate_stream, generate_web

# (n_pages, body_words, seed_hosts_frac) -> sha256[:24] of all columns
_PINNED = {
    (400, 40, 0.08): "4a99971490b18da42463bd9a",
    (600, 40, 0.4): "8ea624faf95e14d01deaca6e",
    (3000, 200, 0.08): "59abf9e99278a6c1544984ea",
}


def _content_hash(tabs: dict[str, pa.Table]) -> str:
    h = hashlib.sha256()
    for name in ("pages", "seeds", "robots_src"):
        t = tabs[name]
        for col in t.column_names:
            for chunk in t.column(col).chunks:
                h.update(str(chunk.to_pylist()).encode())
    return h.hexdigest()[:24]


def test_matches_prestreaming_builder():
    for (n, words, frac), want in _PINNED.items():
        tabs = generate_web(
            WebSpec(n_pages=n, seed=42, body_words=words, seed_hosts_frac=frac)
        )
        assert _content_hash(tabs) == want, (n, words, frac)


def test_chunk_boundary_invariance():
    """The chunk size is a memory knob, never a content knob: a deliberately
    odd tiny chunk must concat to the same table as one big flush."""
    spec = WebSpec(n_pages=500, seed=42, body_words=120)
    one = {n: t for n, t in _generate_stream(spec, 10**9, None)}
    tiny_pages = []
    tiny = {}
    for n, t in _generate_stream(spec, 97, None):
        if n == "pages":
            tiny_pages.append(t)
        else:
            tiny[n] = t
    tiny["pages"] = pa.concat_tables(tiny_pages)
    assert len(tiny_pages) > 1
    for name in ("pages", "seeds", "robots_src"):
        assert tiny[name].combine_chunks().equals(
            one[name].combine_chunks()
        ), name


def test_pool_path_equals_serial(tmp_path=None):
    """r06 ADVICE: every pinned config falls under the 20M pool threshold,
    so the multiprocessing extract1 path was never suite-exercised — drive
    _generate_stream with an explicit small fork Pool and assert equality
    with the serial output (same shape as chunk-boundary invariance)."""
    import multiprocessing as mp

    spec = WebSpec(n_pages=400, seed=42, body_words=80)
    serial = {n: t for n, t in _generate_stream(spec, 10**9, None)}
    with mp.get_context("fork").Pool(3) as pool:
        pooled = {n: t for n, t in _generate_stream(spec, 10**9, pool)}
    for name in ("pages", "seeds", "robots_src"):
        assert pooled[name].combine_chunks().equals(
            serial[name].combine_chunks()
        ), name
