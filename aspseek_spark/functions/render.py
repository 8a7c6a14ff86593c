"""Search-results template rendering (SURVEY.md §3.3 presentation face —
the reference's `[R:src/templates.cpp]` + `[R:etc/s.htm]` analog; round-4
verdict "What's missing" #2, the last user-visible serving gap).

ASPseek's s.cgi renders result pages from a template file whose PUBLIC
documented format is: named sections delimited by ``<!--name--> ...
<!--/name-->`` and ``$(Variable)`` substitutions inside them. This module
re-implements that contract as pure, deterministic Python (presentation is
driver-side by nature — a results PAGE is bounded, user-facing data, never
a data path):

  sections   top        — page header (once)
             restop     — before the result list (only when there are hits)
             res        — one result item (repeated per hit)
             notfound   — instead of the list when there are no hits
             navigator  — paging footer (once, when there are hits)
             bottom     — page footer (once)

  variables  in any section:  $(q) query  $(total) hit count
             $(page)/$(pages) 1-based page numbers  $(first)/$(last)
             per-result (res): $(n) global 1-based rank  $(url) $(title)
             $(excerpt) $(score) $(host)

All substituted values are HTML-escaped (the reference escapes user text
too); a missing variable renders as the empty string; ``$(title)`` falls
back to the URL when the document had no <title> (the reference shows the
URL for untitled docs). Unknown sections in a template are ignored;
missing sections render as empty — so partial templates degrade, never
crash. Everything is pure string work: same inputs → byte-identical page
(golden-tested in tests/test_render.py)."""

from __future__ import annotations

import html
import re

_SECTION_RE = re.compile(r"<!--([a-zA-Z]+)-->\n?(.*?)<!--/\1-->\n?", re.S)
_VAR_RE = re.compile(r"\$\((\w+)\)")

DEFAULT_TEMPLATE = """<!--top--><html><head><title>Search: $(q)</title></head>
<body>
<h1>Results for "$(q)"</h1>
<!--/top-->
<!--restop--><p>$(total) documents found. Page $(page) of $(pages), results $(first)-$(last).</p>
<ol start="$(first)">
<!--/restop-->
<!--res--><li><a href="$(url)">$(title)</a> <small>[$(score)]</small><br>
$(excerpt)<br><cite>$(url)</cite></li>
<!--/res-->
<!--notfound--><p>No documents match the query "$(q)".</p>
<!--/notfound-->
<!--navigator--></ol>
<p>Page $(page) / $(pages)</p>
<!--/navigator-->
<!--bottom--></body></html>
<!--/bottom-->"""


def parse_template(text: str) -> dict[str, str]:
    """``<!--name--> body <!--/name-->`` sections → {name: body}."""
    return {m.group(1): m.group(2) for m in _SECTION_RE.finditer(text)}


def _subst(section: str, variables: dict) -> str:
    def repl(m: re.Match) -> str:
        v = variables.get(m.group(1))
        return html.escape(str(v), quote=True) if v is not None else ""

    return _VAR_RE.sub(repl, section)


def render_serp(
    template: str | dict[str, str] | None,
    query: str,
    results: list[dict],
    page: int = 0,
    page_size: int = 10,
    total: int | None = None,
) -> str:
    """Render one search-results page. ``results`` is the current PAGE
    (already ranked/grouped/excerpted upstream — SearchJob.render_page);
    each row may carry url/title/excerpt/score/host. ``page`` is 0-based
    (the engine's paging convention); rendered numbers are 1-based (the
    reference's user-facing convention). ``total`` is the full hit count
    ($(total), page arithmetic); defaults to the page length."""
    sections = (
        template if isinstance(template, dict)
        else parse_template(template if template else DEFAULT_TEMPLATE)
    )
    if total is None:
        total = len(results)
    pages = max(1, -(-total // page_size)) if page_size > 0 else 1
    first = page * page_size + 1
    last = page * page_size + len(results)
    common = {
        "q": query, "total": total, "page": page + 1, "pages": pages,
        "first": first, "last": last,
    }
    out: list[str] = [_subst(sections.get("top", ""), common)]
    if results:
        out.append(_subst(sections.get("restop", ""), common))
        for i, r in enumerate(results):
            item = dict(common)
            item.update(r)
            item["n"] = first + i
            if not item.get("title"):
                # untitled doc → the URL stands in (reference behavior)
                item["title"] = item.get("url", "")
            out.append(_subst(sections.get("res", ""), item))
        out.append(_subst(sections.get("navigator", ""), common))
    else:
        out.append(_subst(sections.get("notfound", ""), common))
    out.append(_subst(sections.get("bottom", ""), common))
    return "".join(out)
