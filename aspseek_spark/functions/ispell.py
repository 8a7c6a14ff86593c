"""ispell/aspell affix-dictionary ingestion (S10 — round-5 verdict
next-round #7, "What's missing" #4).

The reference expands query words through ispell morphology dictionaries
loaded once per process ([R:src/spell.cpp] + the misc/ dictionary files);
until round 6 our S10 operator (postings.expand_terms) took only synthetic
``lemma: form ...`` maps. This module parses the PUBLIC affix-file format
(the ispell/aspell/hunspell family — plain text, publicly specified: .aff
affix rules + .dic stem/flag list) into that exact form-map shape, so
dictionary-driven expansion flows through the same probe path.

Supported subset (the classic suffix/prefix core — enough for real
inflection dictionaries; unsupported directives are skipped loudly via
``strict``):

  .aff:   SFX flag cross_product count          (header)
          SFX flag strip add condition          (count rule lines)
          PFX ... (same shape, matched at the word START)
          '#' comments, blank lines
  .dic:   first line = entry count (ignored), then  word[/flags]

Rule semantics (public ispell behavior): a rule with flag F applies to a
.dic word carrying F when ``condition`` matches the word's end (SFX) or
start (PFX); the matched form is word minus ``strip`` plus ``add``
(``0`` = empty). Conditions are character sequences where ``.`` matches
any char and ``[abc]`` / ``[^abc]`` are char classes — matched literally,
one token per char position, never as a general regex.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class AffixRule:
    kind: str  # 'SFX' | 'PFX'
    flag: str
    strip: str
    add: str
    condition: str


def _cond_tokens(cond: str) -> list[str]:
    """Split a condition into per-character-position tokens: literal chars,
    '.', or a '[...]' class."""
    toks: list[str] = []
    i = 0
    while i < len(cond):
        if cond[i] == "[":
            j = cond.index("]", i)
            toks.append(cond[i : j + 1])
            i = j + 1
        else:
            toks.append(cond[i])
            i += 1
    return toks


def _cond_matches(tokens: list[str], word: str, kind: str) -> bool:
    if len(tokens) > len(word):
        return False
    seg = word[-len(tokens):] if kind == "SFX" else word[: len(tokens)]
    for tok, ch in zip(tokens, seg):
        if tok == ".":
            continue
        if tok.startswith("["):
            body = tok[1:-1]
            if body.startswith("^"):
                if ch in body[1:]:
                    return False
            elif ch not in body:
                return False
        elif tok != ch:
            return False
    return True


def parse_affix(aff_text: str, strict: bool = False) -> dict[str, list[AffixRule]]:
    """.aff text → {flag: [rules]}. Unknown directives are ignored unless
    ``strict`` (they don't affect the supported expansion subset)."""
    rules: dict[str, list[AffixRule]] = {}
    expecting: tuple[str, str, int] | None = None  # (kind, flag, remaining)
    for raw in aff_text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        parts = line.split()
        kind = parts[0].upper()
        if kind not in ("SFX", "PFX"):
            if strict and expecting is None:
                raise ValueError(f"unsupported affix directive: {parts[0]}")
            continue
        if expecting is None or expecting[0:2] != (kind, parts[1]):
            # header: KIND flag cross_product count
            if len(parts) < 4:
                raise ValueError(f"malformed affix header: {raw!r}")
            expecting = (kind, parts[1], int(parts[3]))
            rules.setdefault(parts[1], [])
            continue
        # rule line: KIND flag strip add [condition]
        if len(parts) < 4:
            raise ValueError(f"malformed affix rule: {raw!r}")
        _, flag, strip, add = parts[:4]
        cond = parts[4] if len(parts) > 4 else "."
        rules.setdefault(flag, []).append(
            AffixRule(
                kind=kind,
                flag=flag,
                strip="" if strip == "0" else strip.lower(),
                add="" if add == "0" else add.lower(),
                condition=cond.lower(),
            )
        )
        remaining = expecting[2] - 1
        expecting = None if remaining <= 0 else (kind, flag, remaining)
    return rules


def parse_dic(dic_text: str) -> list[tuple[str, str]]:
    """.dic text → [(word, flags)]. The leading entry-count line (pure
    digits, the public format's header) is skipped if present."""
    out: list[tuple[str, str]] = []
    lines = [
        ln.split("#", 1)[0].strip()
        for ln in dic_text.splitlines()
    ]
    lines = [ln for ln in lines if ln]
    if lines and lines[0].isdigit():
        lines = lines[1:]
    for ln in lines:
        word, _, flags = ln.partition("/")
        word = word.strip().lower()
        if word:
            out.append((word, flags.strip()))
    return out


def _apply(rule: AffixRule, word: str) -> str | None:
    if not _cond_matches(_cond_tokens(rule.condition), word, rule.kind):
        return None
    if rule.kind == "SFX":
        if rule.strip and not word.endswith(rule.strip):
            return None
        stem = word[: len(word) - len(rule.strip)] if rule.strip else word
        return stem + rule.add
    if rule.strip and not word.startswith(rule.strip):
        return None
    stem = word[len(rule.strip):] if rule.strip else word
    return rule.add + stem


def expand_dictionary(aff_text: str, dic_text: str) -> dict[str, list[str]]:
    """The loaded dictionary as expand_terms' form map: {stem: [forms]},
    forms in .aff rule order, deduped, stem excluded (expand_terms emits
    the stem itself first)."""
    rules = parse_affix(aff_text)
    out: dict[str, list[str]] = {}
    for word, flags in parse_dic(dic_text):
        forms: list[str] = []
        for fl in flags:
            for rule in rules.get(fl, ()):
                form = _apply(rule, word)
                if form and form != word and form not in forms:
                    forms.append(form)
        out[word] = forms
    return out


def load_ispell(aff_path: str, dic_path: str) -> dict[str, list[str]]:
    """File-pair face (the process-startup load the reference does once):
    feed the result straight to expand_terms / docs_with_any_form /
    SearchJob.search_any_form as ``form_map``."""
    with open(aff_path, encoding="utf-8") as f:
        aff = f.read()
    with open(dic_path, encoding="utf-8") as f:
        dic = f.read()
    return expand_dictionary(aff, dic)
