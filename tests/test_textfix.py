"""Mojibake repair + unicode hygiene (``functions/textfix``): golden
cases, no-damage guarantees, and a hypothesis round-trip property."""

from hypothesis import given, settings
from hypothesis import strategies as st

from p_id_text_extraction_ray.functions.textfix import (fix_mojibake,
                                                        mojibake_score,
                                                        normalize_text)


def corrupt(s: str, rounds: int = 1) -> str:
    """UTF-8 bytes misread as cp1252 (latin-1 for the 5 unmapped)."""
    for _ in range(rounds):
        s = s.encode("utf-8").decode("cp1252", errors="strict") \
            if _cp1252_ok(s) else s.encode("utf-8").decode("latin-1")
    return s


def _cp1252_ok(s: str) -> bool:
    try:
        s.encode("utf-8").decode("cp1252")
        return True
    except UnicodeDecodeError:
        return False


def test_golden_cases():
    assert fix_mojibake("cafÃ©") == "café"
    assert fix_mojibake("naÃ¯ve rÃ©sumÃ©") == "naïve résumé"
    assert fix_mojibake("donâ€™t â€” really") == "don’t — really"
    assert fix_mojibake("Ã¼ber MÃ¼nchen") == "über München"
    assert fix_mojibake("â‚¬100") == "€100"


def test_double_encoding_fixed_in_two_rounds():
    s = "smörgåsbord déjà vu"
    assert fix_mojibake(corrupt(s, rounds=2)) == s


def test_clean_text_untouched():
    for s in ("plain ascii text", "é è ü ñ already correct",
              "math: Ã is a legit standalone char", "", "日本語テキスト"):
        assert fix_mojibake(s) == s


def test_score():
    assert mojibake_score("cafÃ© naÃ¯ve") == 2
    assert mojibake_score("clean text") == 0


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(
    whitelist_categories=("L", "N", "P", "S", "Zs"),
    max_codepoint=0x2122), min_size=1, max_size=40))
def test_roundtrip_property(s):
    """fix(corrupt(x)) == x whenever corrupt(x) actually changed the
    text (pure-ASCII is a fixed point of both)."""
    c = corrupt(s)
    fixed = fix_mojibake(c)
    if c != s:
        # repair either fully recovers or at least never makes it worse
        assert mojibake_score(fixed) <= mojibake_score(c)
        if mojibake_score(c) > 0:
            assert fixed == s or mojibake_score(fixed) < mojibake_score(c)
    else:
        assert fixed == s


def test_normalize_text():
    assert normalize_text("a​b‌‍﻿c") == "abc"
    assert normalize_text("a b") == "a b"
    assert normalize_text("keep\nlines\tand tabs") == "keep\nlines\tand tabs"
    assert normalize_text("drop\x00\x01\x1f\x7f\x9fctl") == "dropctl"
    assert normalize_text("é") == "é"          # NFC compose
