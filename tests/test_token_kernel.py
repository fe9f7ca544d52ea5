"""Property tests for the shared vectorized token-scoring kernel
(`_util.doc_token_value_sums` / `doc_token_weight_sums`): bit-exact
equality with the scalar Counter+sorted loop it replaced, under random
unicode-ish token streams (the contract every LM-scoring oracle's
bit-exactness rests on)."""

import hashlib
from collections import Counter

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from p_id_text_extraction_ray.pipelines._util import (doc_token_value_sums,
                                                      doc_token_weight_sums)

token = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           max_codepoint=0x24F),
    min_size=1, max_size=6)
doc = st.lists(token, min_size=0, max_size=40).map(" ".join)


def _naive_weight_sums(texts, values):
    """The replaced scalar loop, verbatim semantics."""
    out_pos, out_n, out_s = [], [], []
    for i, text in enumerate(texts):
        cnt = Counter(text.split())
        if not cnt:
            continue
        acc = 0.0
        for t in sorted(cnt):
            h = int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
            acc = acc + cnt[t] * values[h]
        out_pos.append(i)
        out_n.append(sum(cnt.values()))
        out_s.append(acc)
    return out_pos, out_n, out_s


@settings(max_examples=60, deadline=None)
@given(st.lists(doc, min_size=0, max_size=12))
def test_weight_sums_bit_exact_vs_scalar_loop(texts):
    values = np.arange(65536, dtype=np.float64) / 65536.0 - 0.5
    pos, ns, sums = doc_token_weight_sums(texts, values, {})
    want_pos, want_n, want_s = _naive_weight_sums(texts, values)
    assert pos.tolist() == want_pos
    assert ns.tolist() == want_n
    assert len(sums) == len(want_s)
    for got, want in zip(sums, want_s):
        assert float(got) == float(want)  # bit-exact, not approx


@settings(max_examples=40, deadline=None)
@given(st.lists(doc, min_size=0, max_size=10))
def test_value_sums_arbitrary_value_fn(texts):
    """The generalized kernel with a per-token (not bucketed) value map —
    the unigram-LM shape — matches the scalar re-derivation."""
    def val_of(t: str) -> float:
        return (len(t) * 0.25) - 1.0

    def uniq_vals(uniq):
        return np.array([val_of(t) for t in uniq], np.float64)

    pos, ns, sums = doc_token_value_sums(texts, uniq_vals)
    j = 0
    for i, text in enumerate(texts):
        cnt = Counter(text.split())
        if not cnt:
            continue
        acc = 0.0
        for t in sorted(cnt):
            acc = acc + cnt[t] * np.float64(val_of(t))
        assert pos[j] == i
        assert ns[j] == sum(cnt.values())
        assert float(sums[j]) == float(acc)
        j += 1
    assert j == len(sums)
