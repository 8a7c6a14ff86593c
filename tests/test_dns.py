"""SRC4 DNS resolve + cache seam (sources/dns.py): resolve-once caching,
failure caching, TTL expiry re-resolution, and the compose-with-fetcher
filter — the cache-table semantics a live resolver drops into."""

from __future__ import annotations

from aspseek_spark.sources.dns import (
    MockResolver,
    empty_dns,
    resolvable_hosts,
    resolve_missing,
)

T0 = 1767225600
TTL = 3600


def _hosts(spark, names):
    return spark.createDataFrame([(h,) for h in names], "host string")


def test_resolve_missing_only_touches_uncached_hosts(spark):
    resolver = MockResolver(
        overrides={"a.test": "10.0.0.1"}, dead={"dead.test"}
    )
    cache0 = empty_dns(spark)
    delta1 = resolve_missing(
        _hosts(spark, ["a.test", "b.test", "dead.test"]),
        cache0, resolver, T0, ttl_s=TTL,
    ).localCheckpoint()
    rows = {r["host"]: r for r in delta1.collect()}
    assert rows["a.test"]["addr"] == "10.0.0.1"
    assert rows["b.test"]["addr"].startswith("10.")
    assert rows["dead.test"]["addr"] is None  # failure IS cached
    assert all(r["ttl_unix"] == T0 + TTL for r in rows.values())

    # second round: cached hosts (incl. the dead one) are NOT re-resolved;
    # only the brand-new host is
    cache1 = cache0.unionByName(delta1)
    delta2 = resolve_missing(
        _hosts(spark, ["a.test", "dead.test", "new.test"]),
        cache1, resolver, T0 + 60, ttl_s=TTL,
    ).collect()
    assert {r["host"] for r in delta2} == {"new.test"}


def test_ttl_expiry_forces_reresolution(spark):
    resolver = MockResolver()
    cache0 = empty_dns(spark)
    delta1 = resolve_missing(
        _hosts(spark, ["x.test"]), cache0, resolver, T0, ttl_s=TTL
    ).localCheckpoint()
    cache1 = cache0.unionByName(delta1)
    # before expiry: nothing to do; after expiry: re-resolved
    assert (
        resolve_missing(
            _hosts(spark, ["x.test"]), cache1, resolver, T0 + TTL - 1
        ).count()
        == 0
    )
    redo = resolve_missing(
        _hosts(spark, ["x.test"]), cache1, resolver, T0 + TTL, ttl_s=TTL
    ).collect()
    assert [r["host"] for r in redo] == ["x.test"]
    assert redo[0]["resolved_unix"] == T0 + TTL


def test_resolvable_hosts_filters_failures_and_expired(spark):
    resolver = MockResolver(dead={"dead.test"})
    cache = resolve_missing(
        _hosts(spark, ["ok.test", "dead.test", "old.test"]),
        empty_dns(spark), resolver, T0, ttl_s=TTL,
    ).localCheckpoint()
    # age out old.test by querying past its TTL via a doctored cache row
    from pyspark.sql import functions as F

    cache = cache.withColumn(
        "ttl_unix",
        F.when(F.col("host") == "old.test", F.lit(T0 - 1)).otherwise(
            F.col("ttl_unix")
        ),
    )
    ok = {r["host"] for r in resolvable_hosts(cache, T0).collect()}
    assert ok == {"ok.test"}


def test_deterministic_across_partitions(spark):
    """The mapInPandas resolve is batch-shape independent: same hosts in
    1 or 8 partitions → identical (host, addr) rows."""
    names = [f"h{i:03d}.test" for i in range(200)]
    resolver = MockResolver()
    one = resolve_missing(
        _hosts(spark, names).coalesce(1), empty_dns(spark), resolver, T0
    ).collect()
    many = resolve_missing(
        _hosts(spark, names).repartition(8), empty_dns(spark), resolver, T0
    ).collect()
    assert {(r["host"], r["addr"]) for r in one} == {
        (r["host"], r["addr"]) for r in many
    }
