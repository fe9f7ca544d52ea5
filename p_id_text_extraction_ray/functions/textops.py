"""Text-path kernels: whitespace normalization, boilerplate strip, token
counting, quality features, language ID, ISA-tag classification, document
fingerprinting.

These implement the north-star text path (pure-text spans bypass the CV
path: batched tokenize + boilerplate-strip) plus the training-data text
analysis operators. Every count-valued function is specified so a DuckDB SQL
oracle can reproduce it exactly (integer outputs; regexes restricted to the
RE2-compatible subset).

The ISA instrument-tag pattern classifies recognized P&ID strings like
``PIC-101`` / ``FT-2003A`` (north star; the reference emits raw text only —
``/root/reference/src/text_detection/text_recognition.py:175-189``).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- ISA instrument tags -------------------------------------------------

ISA_TAG_FULL_RE = re.compile(r"^[A-Z]{1,4}-[0-9]{1,5}[A-Z]?$")
# Embedded-in-prose variant (used for extraction from text spans).
ISA_TAG_FIND_PATTERN = r"\b[A-Z]{1,4}-[0-9]{1,5}[A-Z]?\b"


def classify_kinds(texts: pa.Array) -> pa.Array:
    """Span kind for recognized image text: 'tag' when the whole string is an
    ISA instrument tag, else 'image_text'. Vectorized Arrow kernel."""
    is_tag = pc.match_substring_regex(texts, r"^[A-Z]{1,4}-[0-9]{1,5}[A-Z]?$")
    return pc.if_else(is_tag, pa.scalar("tag"), pa.scalar("image_text"))


# --- whitespace + boilerplate -------------------------------------------

# Exact-line and prefix boilerplate rules (FIXTURES.md: injected boilerplate
# like "COPYRIGHT FOOTER" / repeated nav strings must be stripped).
_BOILER_PREFIX_PATTERN = (
    r"^(copyright|all rights reserved|cookie|subscribe now|"
    r"terms of (use|service)|privacy policy|(nav|menu|footer|header)\b)")
_BOILER_PREFIX_RE = re.compile(_BOILER_PREFIX_PATTERN, re.IGNORECASE)
_WS_RUN_RE = re.compile(r"[ \t\r\f\v]+")


def normalize_whitespace(text: str) -> str:
    """Collapse all whitespace runs (incl. newlines) to single spaces and
    trim. SQL parity: ``trim(regexp_replace(text, '\\s+', ' ', 'g'))``."""
    return re.sub(r"\s+", " ", text).strip()


def strip_boilerplate(text: str) -> str:
    """Line-level clean: per line collapse spaces + trim, drop empty and
    boilerplate lines, join survivors with a single newline."""
    out: list[str] = []
    for line in text.split("\n"):
        line = _WS_RUN_RE.sub(" ", line).strip()
        if not line or _BOILER_PREFIX_RE.match(line):
            continue
        out.append(line)
    return "\n".join(out)


def clean_text_column(texts: pa.Array) -> pa.Array:
    """Vectorized strip_boilerplate for Arrow string arrays.

    Newline-free inputs take the fast path: whitespace normalization plus
    the single-line boilerplate drop (a boilerplate-only string cleans to
    ''); multi-line inputs fall back to the per-string kernel.
    """
    has_nl = pc.match_substring(texts, "\n")
    if not pc.any(has_nl).as_py():
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(texts, r"\s+", " "))
        boiler = pc.match_substring_regex(norm, _BOILER_PREFIX_PATTERN,
                                          ignore_case=True)
        return pc.if_else(boiler, pa.scalar(""), norm)
    return pa.array([strip_boilerplate(t) if t is not None else None
                     for t in texts.to_pylist()], type=pa.string())


# --- token / quality / language features --------------------------------

_WORD_RE = r"\w+"
_PUNCT_RE = r"[^\w\s]"

# Marker stopwords per language, checked as whole words, case-insensitive.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # tie-break: earlier wins on strict >

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def token_count(texts: pa.Array) -> pa.Array:
    """Number of ``\\w+`` tokens per string (whitespace+punct tokenizer).
    SQL parity: ``len(regexp_extract_all(text, '\\w+'))``."""
    return pc.count_substring_regex(texts, _WORD_RE)


def quality_features(texts: pa.Array) -> dict[str, pa.Array]:
    """Integer quality-scoring features per document. SQL-exact by design
    (counts only; ratios derive in the caller if needed)."""
    return {
        "n_chars": pc.utf8_length(texts),
        "n_words": pc.count_substring_regex(texts, _WORD_RE),
        "n_punct": pc.count_substring_regex(texts, _PUNCT_RE),
        "n_stop": _word_count_any(texts, STOPWORDS),
        "n_upper": pc.count_substring_regex(texts, r"[A-Z]"),
        "n_digit": pc.count_substring_regex(texts, r"[0-9]"),
    }


def _word_count_any(texts: pa.Array, words: tuple[str, ...] | list[str]) -> pa.Array:
    pattern = r"\b(" + "|".join(words) + r")\b"
    return pc.count_substring_regex(texts, pattern, ignore_case=True)


def lang_id(texts: pa.Array) -> pa.Array:
    """Marker-stopword language heuristic: per language count whole-word
    marker hits; predict the first language (LANG_ORDER) whose count is
    strictly greater than every later one and > 0, else 'und'."""
    counts = {lang: _word_count_any(texts, LANG_MARKERS[lang]).to_numpy(zero_copy_only=False)
              for lang in LANG_ORDER}
    n = len(texts)
    pred = np.full(n, "und", dtype=object)
    best = np.zeros(n, dtype=np.int64)
    for lang in LANG_ORDER:  # earlier language wins ties via strict >
        c = counts[lang]
        take = c > best
        pred[take] = lang
        best = np.maximum(best, c)
    pred[best == 0] = "und"
    return pa.array(pred, type=pa.string())


# --- document fingerprint ------------------------------------------------

_FP_BASE = 1000003
_FP_MASK = (1 << 64) - 1  # mod 2^64: numpy uint64 wrap-around = exact math


def fingerprint(text: str) -> int:
    """Rolling polynomial hash (mod 2^64) over the whitespace-normalized
    UTF-8 bytes — a deterministic content fingerprint."""
    h = 0
    for byte in normalize_whitespace(text).encode("utf-8"):
        h = (h * _FP_BASE + byte) & _FP_MASK
    return h


def fingerprint_column(texts: pa.Array) -> pa.Array:
    """Vectorized fingerprints: Horner's rule evaluated columnwise over a
    padded byte matrix in uint64 (wrap-around multiply = mod 2^64), so the
    hash math itself is numpy, not a per-row Python loop."""
    py = texts.to_pylist()
    encoded = [normalize_whitespace(t or "").encode("utf-8") for t in py]
    n = len(encoded)
    if n == 0:
        return pa.array([], type=pa.uint64())
    maxlen = max((len(b) for b in encoded), default=0)
    if maxlen == 0:
        return pa.array([0] * n, type=pa.uint64())
    mat = np.zeros((n, maxlen), dtype=np.uint64)
    lens = np.array([len(b) for b in encoded], dtype=np.int64)
    for i, b in enumerate(encoded):
        if b:
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.zeros(n, dtype=np.uint64)
    base = np.uint64(_FP_BASE)
    with np.errstate(over="ignore"):
        for col in range(maxlen):
            active = lens > col
            h[active] = h[active] * base + mat[active, col]
    return pa.array(h, type=pa.uint64())
