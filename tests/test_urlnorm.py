"""Canonicalizer unit + property tests (SURVEY.md §5.5)."""

from __future__ import annotations

import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from aspseek_spark.functions.urlnorm import canon1, host_of, resolve_href


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        ("HTTP://Host.Test:80/a/../b.html#frag", "http://host.test/b.html"),
        ("http://host.test", "http://host.test/"),
        ("https://host.test:443/x?q=1#y", "https://host.test/x?q=1"),
        ("https://host.test:8443/x", "https://host.test:8443/x"),
        ("http://host.test/%70age.html", "http://host.test/page.html"),
        ("http://host.test/%2Fa", "http://host.test/%2Fa"),
        ("http://host.test/a/./b/../c", "http://host.test/a/c"),
        ("http://host.test/a/b/..", "http://host.test/a/"),
        ("http://host.test./x", "http://host.test/x"),
        ("ftp://host.test/x", None),
        ("mailto:a@b.c", None),
        ("", None),
        ("http://", None),
        ("   http://host.test/x  ", "http://host.test/x"),
        # illegal raw chars are %-encoded so canon is a fixpoint (r3 defect)
        ("http://host.test/a b.html", "http://host.test/a%20b.html"),
        ("http://A.AA/ #", "http://a.aa/%20"),
        ("http://host.test/x?q=a b", "http://host.test/x?q=a%20b"),
        ("http://host.test/café", "http://host.test/caf%C3%A9"),
        ('http://host.test/"x"', "http://host.test/%22x%22"),
        ("http://host.test/100% legit", "http://host.test/100%%20legit"),
    ],
)
def test_canon_cases(raw, want):
    assert canon1(raw) == want


@pytest.mark.parametrize(
    ("base", "href", "want"),
    [
        ("http://h.test/dir/p.html", "../p2.html", "http://h.test/p2.html"),
        ("http://h.test/dir/p.html", "sub/p3.html", "http://h.test/dir/sub/p3.html"),
        ("http://h.test/dir/p.html", "/abs.html", "http://h.test/abs.html"),
        ("http://h.test/dir/p.html", "//other.test/x", "http://other.test/x"),
        ("http://h.test/dir/p.html", "HTTP://OTHER.test/x", "http://other.test/x"),
        ("http://h.test/dir/p.html", "#frag", None),
        ("http://h.test/dir/p.html", "javascript:void(0)", None),
        ("http://h.test/dir/p.html", "mailto:x@y.z", None),
        ("http://h.test/dir/p.html", "", None),
    ],
)
def test_resolve_cases(base, href, want):
    assert resolve_href(base, href) == want


def test_host_of():
    assert host_of("http://h.test/x") == "h.test"
    assert host_of("http://h.test:8080/x") == "h.test:8080"
    assert host_of("https://h.test/") == "h.test"


_url_chars = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789-._~/%?=&#:+ ",
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    host=st.from_regex(r"[a-zA-Z][a-zA-Z0-9\-]{0,10}(\.[a-zA-Z]{2,4}){1,2}", fullmatch=True),
    rest=_url_chars,
)
@example(
    scheme='http',
    host='A.AA',
    rest=' #',
).via('discovered failure')
def test_canon_idempotent(scheme, host, rest):
    u = f"{scheme}://{host}/{rest}"
    c = canon1(u)
    if c is not None:
        assert canon1(c) == c  # idempotence
        assert c.startswith(("http://", "https://"))
        assert "#" not in c
