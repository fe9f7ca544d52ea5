"""Encoding repair for crawl text: mojibake fixing and unicode hygiene.

Crawled corpora are full of UTF-8 bytes that some upstream system
decoded as Latin-1/cp1252 ("Ã©" where "é" was meant). The fixer is the
standard ftfy-style round-trip: re-encode the suspect text with the
byte-preserving cp1252 map and try a UTF-8 decode — applied only when
the text actually shows a mojibake signature and the repair strictly
reduces it, so clean text can never be damaged. Pure functions; the
Ray stage wraps them in ``map_batches`` (see
``pipelines/webextract.fix_text_encoding``).
"""

from __future__ import annotations

import re
import unicodedata

# cp1252 has 5 unassigned bytes (0x81 8D 8F 90 9D); Latin-1 maps them to
# C1 controls. Encoding with cp1252 first and falling back to latin-1
# per char reproduces the permissive decoder browsers (and crawlers) use.
_MOJIBAKE_LEAD = re.compile("[Â-ÃÅâ][-¿"
                            "ŒœŠšŸŽž"
                            "ƒˆ˜–—‘’"
                            "‚“”„†‡•"
                            "…‰‹›€™]")
_ZERO_WIDTH = dict.fromkeys(map(ord, "​‌‍﻿"), None)
_CONTROL = dict.fromkeys(
    c for c in range(0x20) if chr(c) not in "\n\t")
_CONTROL.update(dict.fromkeys(range(0x7f, 0xa0)))


def _to_bytes(text: str) -> bytes | None:
    """The byte string a permissive cp1252/latin-1 decoder started from,
    or None if some character can't have come from one byte."""
    try:
        return text.encode("cp1252")
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for ch in text:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            cp = ord(ch)
            if cp > 0xFF:
                return None
            out.append(cp)
    return bytes(out)


def mojibake_score(text: str) -> int:
    """Number of mojibake lead-pair signatures in the text."""
    return len(_MOJIBAKE_LEAD.findall(text))


def fix_mojibake(text: str, max_rounds: int = 2) -> str:
    """Undo up to ``max_rounds`` of UTF-8-read-as-cp1252 corruption.

    Each round applies only if (a) the text shows a mojibake signature,
    (b) the byte round-trip decodes as valid UTF-8, and (c) the repair
    strictly lowers the signature count — so already-correct text (even
    text legitimately containing "Ã") is returned unchanged.
    """
    cur = text
    for _ in range(max_rounds):
        score = mojibake_score(cur)
        if not score:
            break
        raw = _to_bytes(cur)
        if raw is None:
            break
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if mojibake_score(fixed) >= score:
            break
        cur = fixed
    return cur


def normalize_text(text: str) -> str:
    """Unicode hygiene for corpus text: NFC normalize, drop zero-width
    characters and C0/C1 controls (keeping newline and tab), and map
    non-breaking spaces to plain spaces."""
    text = unicodedata.normalize("NFC", text)
    text = text.translate(_ZERO_WIDTH).translate(_CONTROL)
    return text.replace(" ", " ")
