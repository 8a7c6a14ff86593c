"""CrawlConfig — frozen crawl configuration (SURVEY.md §1.1 D8).

Mirrors the semantics of ASPseek's aspseek.conf directives (MaxHops,
DeltaTime, Period, MaxDocSize, UserAgent, Server/Realm allow + Disallow
filters — reference [R:etc/aspseek.conf-dist], [R:src/config.cpp],
restated by BASELINE.json:6). Values are validated at job start and the
same dataclass drives both the Spark engine and the pure-Python oracle
crawler, so semantics cannot drift between them.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, asdict

EPOCH_ISO = "2026-01-01T00:00:00"
EPOCH_UNIX = 1767225600  # 2026-01-01T00:00:00Z


@dataclass(frozen=True)
class FilterRule:
    """One allow/deny rule; first match wins (ASPseek Allow/Disallow chain).

    kind: 'prefix' (string prefix on the canonical URL) or 'regex'.
    """

    allow: bool
    kind: str
    pattern: str

    def matches(self, url: str) -> bool:
        if self.kind == "prefix":
            return url.startswith(self.pattern)
        return re.search(self.pattern, url) is not None


@dataclass(frozen=True)
class CrawlConfig:
    # --- reference-semantics knobs (BASELINE.json:6) ---
    max_hops: int = 3  # MaxHops: outlinks deeper than this are dropped
    delta_time_s: int = 2  # DeltaTime: spacing between fetches on one host
    # robots.txt Crawl-delay (de-facto politeness extension): when honored,
    # a host's advertised delay overrides delta_time_s for ITS fetch
    # spacing, capped (hostile robots.txt can claim hours). Engine and
    # oracle share parse_robots_full and this exact precedence.
    honor_crawl_delay: bool = True
    crawl_delay_cap_s: int = 300
    period_s: int = 7 * 24 * 3600  # Period: revisit interval after a fetch
    host_budget: int = 8  # max URLs fetched per host per round
    max_doc_size: int = 256 * 1024  # MaxDocSize: body bytes cap before parse
    user_agent: str = "repo-bot"
    max_urls_per_round: int | None = None  # global round cap (W2); None = off
    round_interval_s: int = 3600  # wall-time advanced per micro-batch round
    tag: int = 0  # tag assigned to URLs discovered by this crawl (ASPseek Tag)
    tag_filter: int | None = None  # F9: crawl only this tag subset (index -t)
    # first-match-wins allow/deny chain (F1/F2); empty chain = allow all
    filters: tuple[FilterRule, ...] = ()
    default_allow: bool = True
    # F5 MIME filter (ASPseek checks Content-Type before indexing): pages
    # outside this set are still fetched/recorded but contribute no text
    # and no outlinks. None in the corpus column ⇒ treated as text/html.
    allowed_content_types: tuple[str, ...] = ("text/html",)
    # SRC3 robots cache TTL: a host's robots.txt is re-fetched once its
    # cache entry is older than this (the reference re-reads robots
    # periodically); None = cache forever. The allow filter always uses
    # the NEWEST generation per host.
    robots_period_s: int | None = None
    # --- engine-layout knobs (no reference analog) ---
    # J1 probe layer: 'bloom' (default; deletes rebuild touched blobs) or
    # 'cuckoo' (north_star deletion fallback: true O(1) deletes, same
    # partitioned layout + exact-backstop contract — operators/cuckoo_seen)
    probe: str = "bloom"
    bloom_partitions: int = 32  # P: bloom blob partitions (≈1024 at 1e10 keys)
    bloom_bits_per_partition: int = 1 << 20  # m per partition
    bloom_num_hashes: int = 7  # k
    cuckoo_buckets_per_partition: int = 1 << 14
    shuffle_partitions: int = 32
    # fetch-join strategy switch: batches up to this size broadcast into the
    # pages scan (pages never shuffles); larger batches fall back to a
    # shuffle-hash join — at real scale against a BUCKETED pages table the
    # bucketed side still does not shuffle (see plans/crawl_round.py J3).
    fetch_broadcast_limit: int = 2_000_000
    # J1 exact-backstop layout: the seen table is maintained as a BUCKETED
    # table (bucketBy url_canon) so the backstop anti-join is bucket-local —
    # only the maybe-seen slice shuffles into the bucket layout; the 10^10-row
    # seen side is scanned in place (≈1024+ buckets at design scale).
    seen_buckets: int = 8
    # SNK1 frontier layout: the frontier is partitioned by a due-time bucket
    # fpart = next_fetch_unix // (round_interval_s * frontier_part_rounds) so
    # a round rewrites ONLY partitions it touched (due + new + revisit);
    # the ~period_s/interval untouched future partitions — the bulk of a
    # 10^10-row frontier — keep their existing files byte-identical.
    frontier_part_rounds: int = 4
    # W1 adaptive skew salting (§7 hard-part 6): hosts whose politeness
    # leftover exceeded salt_group_target rows last round get a per-host
    # stage-1 salt S(host) = ceil(backlog / salt_group_target), keeping
    # stage-1 window partitions bounded regardless of per-host skew. The
    # two-stage schedule is salt-invariant, so fetch order never changes.
    adaptive_salt: bool = True
    salt_group_target: int = 4096

    def __post_init__(self) -> None:
        if self.max_hops < 0 or self.delta_time_s < 0 or self.host_budget < 1:
            raise ValueError("invalid CrawlConfig")
        if self.bloom_partitions < 1 or self.bloom_bits_per_partition < 8:
            raise ValueError("invalid bloom sizing")
        if self.probe not in ("bloom", "cuckoo"):
            raise ValueError("probe must be 'bloom' or 'cuckoo'")

    def url_allowed(self, url: str) -> bool:
        """Config allow/deny chain — shared by engine UDF and oracle."""
        for rule in self.filters:
            if rule.matches(url):
                return rule.allow
        return self.default_allow

    def round_ts_unix(self, round_id: int) -> int:
        """Deterministic wall-clock of round N (no Date.now in transforms)."""
        return EPOCH_UNIX + round_id * self.round_interval_s

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "CrawlConfig":
        d = json.loads(s)
        d["filters"] = tuple(FilterRule(**r) for r in d.get("filters", ()))
        if "allowed_content_types" in d:
            d["allowed_content_types"] = tuple(d["allowed_content_types"])
        return CrawlConfig(**d)


DEFAULT_CONFIG = CrawlConfig()
