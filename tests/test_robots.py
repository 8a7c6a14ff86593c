"""robots.txt parse + longest-match decision tests (SURVEY.md F4/SRC3)."""

from __future__ import annotations

from aspseek_spark.functions.robots import parse_robots, path_of, robots_allowed

BODY = (
    b"# comment\n"
    b"User-agent: repo-bot\n"
    b"Disallow: /private/\n"
    b"Allow: /private/open/\n"
    b"\n"
    b"User-agent: *\n"
    b"Disallow: /dir2/\n"
)


def test_group_selection_specific_ua():
    rules = parse_robots(BODY, "repo-bot")
    assert rules == [(False, "/private/"), (True, "/private/open/")]


def test_group_selection_star_fallback():
    rules = parse_robots(BODY, "otherbot")
    assert rules == [(False, "/dir2/")]


def test_longest_match_allow_wins_tie():
    rules = [(False, "/a/"), (True, "/a/b/"), (False, "/a/b/"), (True, "/")]
    assert robots_allowed(rules, "/a/x") is False
    assert robots_allowed(rules, "/a/b/x") is True  # allow wins length tie
    assert robots_allowed(rules, "/c") is True


def test_empty_disallow_means_allow_all():
    assert parse_robots(b"User-agent: *\nDisallow:\n", "repo-bot") == []
    assert robots_allowed([], "/anything") is True
    assert robots_allowed(None, "/anything") is True


def test_disallow_all():
    rules = parse_robots(b"User-agent: *\nDisallow: /\n", "repo-bot")
    assert robots_allowed(rules, "/") is False
    assert robots_allowed(rules, "/x/y") is False


def test_multi_ua_lines_share_group():
    body = b"User-agent: a\nUser-agent: repo-bot\nDisallow: /x/\n"
    assert parse_robots(body, "repo-bot") == [(False, "/x/")]


def test_longest_ua_substring_wins():
    body = (
        b"User-agent: repo\nDisallow: /short/\n\n"
        b"User-agent: repo-bot\nDisallow: /long/\n"
    )
    assert parse_robots(body, "repo-bot") == [(False, "/long/")]


def test_path_of():
    assert path_of("http://h.test/a/b?q=1") == "/a/b?q=1"
    assert path_of("http://h.test") == "/"
