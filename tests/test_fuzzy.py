"""Fuzzy matching + boilerplate removal on planted fixtures, each checked
against an independent single-machine re-derivation (brute-force
Levenshtein all-pairs; per-doc Python span masking)."""

import os

import numpy as np
import pandas as pd
import pytest

from p_id_text_extraction_ray.pipelines.fuzzy import (
    BOIL_K, FUZZY_MAX_DIST, delete_variants, fuzzy_token_pairs,
    levenshtein_banded, strip_boilerplate_ngrams)


def _lev_full(a: str, b: str) -> int:
    """Reference full-matrix Levenshtein DP (no band, no early exit)."""
    la, lb = len(a), len(b)
    prev = list(range(la + 1))
    for i in range(1, lb + 1):
        cur = [i] + [0] * la
        for j in range(1, la + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[j - 1] != b[i - 1]))
        prev = cur
    return prev[la]


def test_banded_levenshtein_matches_full_dp():
    rng = np.random.default_rng(11)
    alphabet = list("abcd")
    for _ in range(400):
        a = "".join(rng.choice(alphabet, rng.integers(0, 8)))
        b = "".join(rng.choice(alphabet, rng.integers(0, 8)))
        full = _lev_full(a, b)
        banded = levenshtein_banded(a, b)
        if full <= FUZZY_MAX_DIST:
            assert banded == full, (a, b)
        else:
            assert banded > FUZZY_MAX_DIST, (a, b)


def test_delete_variants_cover_edit_neighbors():
    # the SymSpell guarantee: lev(a,b) <= 2 => shared delete-<=2 variant
    rng = np.random.default_rng(5)
    alphabet = list("abc")
    for _ in range(300):
        a = "".join(rng.choice(alphabet, rng.integers(1, 7)))
        b = "".join(rng.choice(alphabet, rng.integers(1, 7)))
        if _lev_full(a, b) <= FUZZY_MAX_DIST:
            assert delete_variants(a) & delete_variants(b), (a, b)


@pytest.fixture(scope="module")
def fuzzy_dir(tmp_path_factory):
    """Vocabulary with planted near-miss clusters (typos at distance 1
    and 2) plus far-apart fillers, spread across documents."""
    root = str(tmp_path_factory.mktemp("fuzzy"))
    vocab = ["pump", "pumps", "punp", "valve", "valv", "vallve",
             "reactor", "reacter", "compressor", "turbine", "turbina",
             "xylophone", "zzzzzz", "ab", "abc", "b"]
    rng = np.random.default_rng(3)
    docs = [" ".join(rng.choice(vocab, 12)) for _ in range(40)]
    pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": docs,
        "lang": ["en"] * 40,
        "source": ["s0"] * 40,
        "n_chars": [len(d) for d in docs],
    }).to_parquet(os.path.join(root, "documents.parquet"))
    return root


def test_fuzzy_pairs_equal_bruteforce(ray_session, fuzzy_dir):
    got = fuzzy_token_pairs(fuzzy_dir)

    toks = set()
    for t in pd.read_parquet(os.path.join(fuzzy_dir,
                                          "documents.parquet"))["text"]:
        toks.update(t.split())
    want = sorted(
        (a, b, _lev_full(a, b))
        for i, a in enumerate(sorted(toks)) for b in sorted(toks)[i + 1:]
        if _lev_full(a, b) <= FUZZY_MAX_DIST)
    assert list(map(tuple, got.to_numpy())) == want
    assert len(want) >= 5  # the planted clusters actually fire


@pytest.fixture(scope="module")
def boiler_dir(tmp_path_factory):
    """Docs sharing one planted 9-word boilerplate footer (so every
    8-gram inside it is hot) plus unique bodies; one doc shorter than
    BOIL_K words; one doc that repeats a gram only within itself."""
    root = str(tmp_path_factory.mktemp("boiler"))
    footer = "subscribe to our newsletter for updates terms apply today"
    rows = []
    for i in range(12):
        # doc-unique body tokens: no body or body/footer-boundary gram
        # can repeat across documents, so ONLY the footer grams are hot
        body = " ".join(f"b{i}w{j}" for j in range(30))
        rows.append(body + " " + footer)
    rows.append("short doc only")                      # < BOIL_K words
    words = [f"s{j}" for j in range(BOIL_K)]
    selfrep = " ".join(words) + " filler " + " ".join(words)
    rows.append(selfrep)                               # within-doc repeat only
    pd.DataFrame({
        "doc_id": np.arange(len(rows), dtype=np.int64),
        "text": rows,
        "lang": ["en"] * len(rows),
        "source": ["s0"] * len(rows),
        "n_chars": [len(r) for r in rows],
    }).to_parquet(os.path.join(root, "documents.parquet"))
    return root


def test_boilerplate_stripped_bodies_kept(ray_session, boiler_dir):
    out = strip_boilerplate_ngrams(boiler_dir).to_pandas() \
        .set_index("doc_id").sort_index()
    docs = pd.read_parquet(os.path.join(boiler_dir, "documents.parquet")) \
        .set_index("doc_id").sort_index()

    footer_words = 9
    for i in range(12):
        body = " ".join(docs.loc[i, "text"].split()[:30])
        # footer fully removed (every one of its 8-grams is hot), the
        # unique 30-word body untouched
        assert out.loc[i, "text_stripped"] == body
        assert out.loc[i, "n_removed"] == footer_words

    # short doc carries no gram -> unchanged
    assert out.loc[12, "text_stripped"] == "short doc only"
    assert out.loc[12, "n_removed"] == 0
    # within-doc-only repetition is df=1 -> unchanged
    assert out.loc[13, "text_stripped"] == docs.loc[13, "text"]
    assert out.loc[13, "n_removed"] == 0
