"""ispell/aspell affix-dictionary ingestion (S10 — round-5 verdict
next-round #7): parse the public .aff/.dic format into the expand_terms
form map. Pure functions — no Spark session needed."""

from __future__ import annotations

import os

import pytest

from aspseek_spark.functions.ispell import (
    AffixRule,
    _apply,
    expand_dictionary,
    load_ispell,
    parse_affix,
    parse_dic,
)
from aspseek_spark.operators.postings import expand_terms

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "aspseek_spark", "data",
)
AFF = os.path.join(DATA, "en_tiny.aff")
DIC = os.path.join(DATA, "en_tiny.dic")


def test_parse_affix_headers_and_rules():
    rules = parse_affix(open(AFF).read())
    assert {len(rules[f]) for f in "SGDR"} == {3, 2, 2, 2}
    assert rules["U"][0].kind == "PFX" and rules["U"][0].add == "un"
    # strip/add '0' normalize to empty
    assert rules["S"][1].strip == "" and rules["S"][1].add == "s"


def test_condition_classes():
    # [^aeiou]y — consonant+y takes -ies; vowel+y falls to the 's' rule
    r_ies = AffixRule("SFX", "S", "y", "ies", "[^aeiou]y")
    assert _apply(r_ies, "query") == "quer3es".replace("3", "i")
    assert _apply(r_ies, "day") is None  # 'a' is a vowel
    # '.' wildcard
    assert _apply(AffixRule("PFX", "U", "", "un", "."), "do") == "undo"
    # strip must match the word end
    assert _apply(AffixRule("SFX", "G", "e", "ing", "e"), "crawl") is None


def test_parse_dic_skips_count_header_and_comments():
    entries = parse_dic("3\nquery/S\n# comment\nplain\n")
    assert entries == [("query", "S"), ("plain", "")]


def test_expand_dictionary_full_fixture():
    fm = load_ispell(AFF, DIC)
    assert fm["query"] == ["queries"]
    assert fm["table"] == ["tables"]
    assert fm["merge"] == ["merging", "merged", "merger"]  # e-drop rules
    assert fm["index"] == ["indexes"]  # [sxzh] → -es
    assert fm["filter"] == ["unfilter", "filters", "filtered"]  # PFX + SFX
    # flagless words map to no forms (still present as stems)
    assert expand_dictionary("SFX S Y 1\nSFX S 0 s .", "1\nword\n") == {
        "word": []
    }


def test_feeds_expand_terms():
    fm = load_ispell(AFF, DIC)
    assert expand_terms(["query", "table"], fm) == [
        "query", "queries", "table", "tables"
    ]
    # a word outside the dictionary falls back to the built-in rule
    assert expand_terms(["docs"], fm) == ["docs", "doc"]


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        parse_affix("SFX S Y\n")  # short header
    with pytest.raises(ValueError):
        parse_affix("SFX S Y 1\nSFX S 0\n")  # short rule line
    with pytest.raises(ValueError):
        parse_affix("REP 5\n", strict=True)  # unsupported directive
