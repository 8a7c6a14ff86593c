"""End-to-end searchd drive (round-5 verdict next-round #6): crawl a tiny
web, index it, start the daemon, run concurrent client sessions THROUGH a
live merge flip and a realtime append, and print PASS/FAIL per check.

Run: python scripts/searchd_demo.py
"""

from __future__ import annotations

import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    from aspseek_spark.plans.search_job import SearchJob
    from aspseek_spark.plans.searchd import SearchClient, SearchDaemon

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("searchd_demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok = True

    def check(name: str, cond: bool, detail: str = "") -> None:
        nonlocal ok
        print(f"{'PASS' if cond else 'FAIL'} {name}"
              + (f" {detail}" if detail else ""), flush=True)
        ok = ok and cond

    import tempfile

    SCHEMA = (
        "round int, url_canon string, url_hash64 long, host string, "
        "depth int, status int, text string"
    )
    rows = [
        (1, f"http://h{i % 4}.test/p{i}", i, f"h{i % 4}.test", 1, 200,
         f"engine page{i} spark search")
        for i in range(40)
    ]
    job = SearchJob(spark, tempfile.mkdtemp(prefix="searchd_demo_"),
                    n_buckets=16)
    job.build_from_fetched(spark.createDataFrame(rows, SCHEMA))

    daemon = SearchDaemon(job)
    host, port = daemon.start()
    check("daemon listening", port > 0, f"{host}:{port}")

    c = SearchClient(host, port)
    hits = c.query("engine & spark")
    check("query over TCP", {d for d, _ in hits} == set(range(40)),
          f"hits={len(hits)}")
    page = c.render(["engine"])
    check("rendered page over TCP", "documents found" in page,
          f"bytes={len(page)}")

    # bounded result windows (round-6 verdict "wrong" #2): QP pages tile
    # the ranked order; plain Q is the first page under the daemon's cap
    pages = [c.query_page(p, 10, "engine") for p in range(5)]
    flat = [d for pg in pages for d, _ in pg]
    check(
        "paged windows tile the ranked order",
        [len(p) for p in pages] == [10, 10, 10, 10, 0]
        and len(flat) == len(set(flat)) == 40
        and pages[0] == c.query("engine")[:10],
    )

    # concurrent sessions across a merge flip: zero failed reads
    errors: list[Exception] = []
    states: set[frozenset] = set()
    stop = threading.Event()

    def client_loop() -> None:
        try:
            cc = SearchClient(host, port)
            try:
                while not stop.is_set():
                    got = frozenset(d for d, _ in cc.query("engine"))
                    if got not in (frozenset(range(40)),
                                   frozenset(range(44))):
                        raise AssertionError(f"torn read {sorted(got)[:5]}")
                    states.add(got)
            finally:
                cc.close()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=client_loop) for _ in range(3)]
    for t in threads:
        t.start()
    time.sleep(2)
    job.merge_delta(spark.createDataFrame(
        [(2, f"http://hm.test/m{i}", 40 + i, "hm.test", 1, 200,
          f"engine merged{i}") for i in range(4)],
        SCHEMA,
    ))
    time.sleep(2)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    check("zero failed reads across merge flip", not errors,
          f"states={len(states)} errors={errors[:2]}")
    check("post-merge generation served", frozenset(range(44)) in states)

    # realtime append visible to an existing session (epoch moves)
    job.add_realtime(spark.createDataFrame(
        [(3, "http://hr.test/rt", 99, "hr.test", 1, 200, "engine realtime")],
        SCHEMA,
    ))
    check("realtime append visible over TCP",
          99 in {d for d, _ in c.query("engine & realtime")})
    st = c.stats()
    check("stats face", "errors=0" in st, st[:90])
    c.close()
    daemon.stop()
    print("SUMMARY:", "ALL PASS" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
