"""Search query language parser (reference s.cgi front end,
[R:src/parser.cpp]/[R:src/search.cpp] query handling — mount empty at
survey time; the grammar below is ASPseek's documented public syntax).

Grammar (precedence low → high):

    query   := or
    or      := and ( '|' and )*
    and     := unary ( ('&' | ε) unary )*      # adjacency = implicit AND
    unary   := '~' unary | atom
    atom    := '(' query ')' | '"' word+ '"' | 'site:' host
             | 'link:' url | 'after:' unixts | 'before:' unixts | word

Words lowercase at parse time (the postings are lowercase). The parser is
pure Python and produces a tiny AST the Spark evaluator
(operators/postings.eval_query) and the DuckDB oracle generator
(operators/postings.query_oracle_sql) BOTH consume — one parse, two
backends, so engine and oracle cannot disagree about what a query means.

Scoring semantics (deterministic, mirrored by the SQL generator):
    term        → (doc, tf)
    phrase      → (doc, number of phrase occurrences)
    a & b       → docs in both, score a+b
    a | b       → docs in either, score a+b (missing side = 0)
    a & ~b      → docs of a not in b, score of a
A bare NOT ("~x" with no positive side) matches nothing — same as the
reference, which refuses negative-only queries.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class QuerySyntaxError(ValueError):
    pass


@dataclass(frozen=True)
class Term:
    word: str


@dataclass(frozen=True)
class Site:
    """`site:host` modifier — restrict to one site (score-neutral)."""
    host: str


@dataclass(frozen=True)
class Link:
    """`link:url` modifier — docs that link to the URL (score-neutral)."""
    url: str


@dataclass(frozen=True)
class After:
    """`after:unixts` modifier — docs fetched at/after the timestamp
    (s.cgi date-limit analog; absolute so the query is deterministic)."""
    ts: int


@dataclass(frozen=True)
class Before:
    """`before:unixts` modifier — docs fetched strictly BEFORE the
    timestamp. Half-open pairing with After (>= a, < b): ``after:a &
    before:b`` is the s.cgi date-RANGE limit with no boundary overlap."""
    ts: int


@dataclass(frozen=True)
class Phrase:
    words: tuple[str, ...]


@dataclass(frozen=True)
class And:
    left: "Node"
    right: "Node"


@dataclass(frozen=True)
class Or:
    left: "Node"
    right: "Node"


@dataclass(frozen=True)
class Not:
    child: "Node"


Node = Term | Phrase | And | Or | Not | Site | Link | After | Before

_TOKEN_RE = re.compile(r'\s*(?:(\()|(\))|(&)|(\|)|(~)|("([^"]*)")|([^\s()&|~"]+))')


def _tokenize(q: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    i = 0
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            if q[i:].strip():
                raise QuerySyntaxError(f"bad character at {i}: {q[i:]!r}")
            break
        i = m.end()
        if m.group(1):
            toks.append(("(", "("))
        elif m.group(2):
            toks.append((")", ")"))
        elif m.group(3):
            toks.append(("&", "&"))
        elif m.group(4):
            toks.append(("|", "|"))
        elif m.group(5):
            toks.append(("~", "~"))
        elif m.group(6) is not None:
            words = tuple(w.lower() for w in m.group(7).split())
            if not words:
                raise QuerySyntaxError("empty phrase")
            toks.append(("phrase", " ".join(words)))
        else:
            toks.append(("word", m.group(8).lower()))
    return toks


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Node:
        node = self.or_()
        if self.peek() is not None:
            raise QuerySyntaxError(f"unexpected {self.toks[self.i][1]!r}")
        return node

    def or_(self) -> Node:
        node = self.and_()
        while self.peek() == "|":
            self.next()
            node = Or(node, self.and_())
        return node

    def and_(self) -> Node:
        node = self.unary()
        while True:
            p = self.peek()
            if p == "&":
                self.next()
                node = And(node, self.unary())
            elif p in ("(", "~", "word", "phrase"):
                node = And(node, self.unary())  # implicit AND (adjacency)
            else:
                return node

    def unary(self) -> Node:
        if self.peek() == "~":
            self.next()
            return Not(self.unary())
        return self.atom()

    def atom(self) -> Node:
        p = self.peek()
        if p == "(":
            self.next()
            node = self.or_()
            if self.peek() != ")":
                raise QuerySyntaxError("missing ')'")
            self.next()
            return node
        if p == "phrase":
            _, v = self.next()
            words = tuple(v.split())
            return Phrase(words) if len(words) > 1 else Term(words[0])
        if p == "word":
            w = self.next()[1]
            # s.cgi query modifiers (reference search front end): a word
            # token of the form site:HOST / link:URL is a filter atom
            if w.startswith("site:"):
                if not w[5:]:
                    raise QuerySyntaxError("empty site: filter")
                return Site(w[5:])
            if w.startswith("link:"):
                if not w[5:]:
                    raise QuerySyntaxError("empty link: filter")
                return Link(w[5:])
            if w.startswith("after:"):
                try:
                    return After(int(w[6:]))
                except ValueError:
                    raise QuerySyntaxError(
                        f"after: needs a unix timestamp, got {w[6:]!r}"
                    ) from None
            if w.startswith("before:"):
                try:
                    return Before(int(w[7:]))
                except ValueError:
                    raise QuerySyntaxError(
                        f"before: needs a unix timestamp, got {w[7:]!r}"
                    ) from None
            return Term(w)
        raise QuerySyntaxError(f"expected a term, got {p!r}")


def parse_query(q: str) -> Node:
    """Query string → AST. Raises QuerySyntaxError on malformed input."""
    toks = _tokenize(q)
    if not toks:
        raise QuerySyntaxError("empty query")
    return _Parser(toks).parse()


def query_terms(node: Node) -> list[str]:
    """Every word the query touches (incl. phrase words and negated terms)
    in first-appearance order — the posting-probe term set."""
    out: list[str] = []

    def walk(n: Node) -> None:
        if isinstance(n, Term):
            if n.word not in out:
                out.append(n.word)
        elif isinstance(n, Phrase):
            for w in n.words:
                if w not in out:
                    out.append(w)
        elif isinstance(n, (Site, Link, After, Before)):
            pass  # filter atoms probe meta/links tables, not postings
        elif isinstance(n, Not):
            walk(n.child)
        else:
            walk(n.left)
            walk(n.right)

    walk(node)
    return out
