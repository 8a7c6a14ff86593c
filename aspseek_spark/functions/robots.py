"""robots.txt parse + allow decision (SURVEY.md §2.1 SRC3, §2.2 F4).

Capability parity with the reference's robots handling ([R:src/robots.cpp],
cached in the MySQL ``robots`` table per BASELINE.json:6). Exact reference
precedence was unverifiable (empty mount), so the binding rule is RFC 9309
longest-match, documented here and shared verbatim between the Spark engine
(vectorized UDF in operators/robots_join.py) and the oracle crawler:

  - group selection: the group whose User-agent token is the longest
    case-insensitive substring of our UA wins; '*' is the fallback group
  - within the group: the rule with the longest matching path prefix wins;
    on a length tie, Allow wins
  - an empty Disallow value means allow-all (classic robots.txt idiom)
  - no matching rule, no group, or an unfetchable robots.txt (status!=200)
    → allowed

Rules are serialized as list[(allow: bool, path: str)] — the engine stores
them as array<struct<allow:boolean,path:string>> (FIXTURES.md robots table).
"""

from __future__ import annotations

Rule = tuple[bool, str]


def parse_robots_full(
    body: bytes, user_agent: str
) -> tuple[list[Rule], int | None]:
    """Parse a robots.txt body → (rules, crawl_delay seconds) for
    ``user_agent``. Crawl-delay (the de-facto politeness extension many
    robots.txt files carry) belongs to the SAME group-selection rule as the
    allow/disallow rules: the chosen group's delay applies, floored to
    whole seconds (so all downstream sched arithmetic stays integer —
    zero float-parity risk engine↔oracle); absent, negative or garbage
    values → None (the crawler's configured DeltaTime applies)."""
    if body is None:
        return [], None
    text = body.decode("utf-8", errors="replace")
    ua_lower = user_agent.lower()

    groups: list[tuple[list[str], list[Rule], list[int]]] = []
    cur_agents: list[str] = []
    cur_rules: list[Rule] = []
    cur_delay: list[int] = []  # first valid Crawl-delay in the group wins
    in_agents = True  # consecutive User-agent lines share one group
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:
                groups.append((cur_agents, cur_rules, cur_delay))
                cur_agents, cur_rules, cur_delay = [], [], []
                in_agents = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agents = False
            cur_rules.append((key == "allow", val))
        elif key == "crawl-delay":
            in_agents = False
            try:
                d = int(float(val))
            except (ValueError, OverflowError):
                # hostile values: 'inf'/'1e999' overflow int(), 'nan' raises
                # ValueError — all treated as garbage (no delay), never a
                # mid-round crash of the parse UDF or the oracle
                continue
            if d >= 0 and not cur_delay:
                # clamp so the value survives the engine's IntegerType
                # column without wrapping (Arrow safe-cast is off): both
                # backends see the same bounded integer, and the downstream
                # min(cd, crawl_delay_cap_s) is unaffected for sane values
                cur_delay.append(min(d, 2**31 - 1))
        # sitemap ignored
    if cur_agents or cur_rules or cur_delay:
        groups.append((cur_agents, cur_rules, cur_delay))

    best: tuple[list[Rule], list[int]] | None = None
    best_len = -1
    star: tuple[list[Rule], list[int]] | None = None
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = (rules, delay)
            elif a in ua_lower and len(a) > best_len:
                best, best_len = (rules, delay), len(a)
    chosen = best if best is not None else (star if star is not None else ([], []))
    rules, delay = chosen
    # empty-value Disallow = allow all → drop it (it can never match a path
    # more specifically than any other rule, and alone it means "no rules")
    return (
        [(allow, path) for allow, path in rules if path != ""],
        delay[0] if delay else None,
    )


def parse_robots(body: bytes, user_agent: str) -> list[Rule]:
    """Parse a robots.txt body into the rule list for ``user_agent``."""
    return parse_robots_full(body, user_agent)[0]


def robots_allowed(rules: list[Rule] | None, path: str) -> bool:
    """Longest-prefix-match decision; Allow wins length ties."""
    if not rules:
        return True
    best_len = -1
    best_allow = True
    for allow, rule_path in rules:
        if path.startswith(rule_path) and (
            len(rule_path) > best_len
            or (len(rule_path) == best_len and allow and not best_allow)
        ):
            best_len = len(rule_path)
            best_allow = allow
    return best_allow


def path_of(url_canon: str) -> str:
    """Path+query of a canonical URL (the robots match target)."""
    rest = url_canon.split("://", 1)[1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"
