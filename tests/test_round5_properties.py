"""Property tests for the round-5 kernels: Viterbi segmentation
optimality vs brute-force enumeration, and CDC boundary locality."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from p_id_text_extraction_ray.pipelines.cdcdedup import (CDC_MAX_CHUNK,
                                                         CDC_MIN_CHUNK,
                                                         cdc_boundaries)
from p_id_text_extraction_ray.pipelines.sptokenizer import (_UNK_LOGP,
                                                            _viterbi_segment)


def _all_segmentations(word, max_len):
    if not word:
        yield []
        return
    for ln in range(1, min(max_len, len(word)) + 1):
        head = word[:ln]
        for rest in _all_segmentations(word[ln:], max_len):
            yield [head] + rest


def _score(seg, logp):
    s = 0.0
    for piece in seg:
        lp = logp.get(piece)
        if lp is None:
            if len(piece) != 1:
                return None
            lp = _UNK_LOGP
        s += lp
    return s


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc", min_size=1, max_size=8), st.data())
def test_viterbi_is_optimal(word, data):
    # random piece table over substrings of the word
    subs = sorted({word[i:j] for i in range(len(word))
                   for j in range(i + 1, min(i + 4, len(word)) + 1)})
    logp = {}
    for p in subs:
        if data.draw(st.booleans(), label=f"include:{p}"):
            logp[p] = math.log(
                data.draw(st.floats(0.01, 0.99), label=f"p:{p}"))
    got = _viterbi_segment(word, logp, max_len=3)
    assert "".join(got) == word
    got_score = _score(got, logp)
    best = max(
        (s for seg in _all_segmentations(word, 3)
         if (s := _score(seg, logp)) is not None),
        default=None)
    assert best is not None
    assert got_score is not None
    assert abs(got_score - best) < 1e-9


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=1, max_size=2000))
def test_cdc_partition_and_bounds(data):
    ends = cdc_boundaries(data)
    assert ends[-1] == len(data)
    sizes = np.diff([0] + ends)
    assert (sizes > 0).all()
    assert (sizes <= CDC_MAX_CHUNK).all()
    # every chunk except the final partial respects the minimum
    assert (sizes[:-1] >= CDC_MIN_CHUNK).all()


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=CDC_MIN_CHUNK * 3, max_size=1500),
       st.binary(min_size=1, max_size=300))
def test_cdc_suffix_append_preserves_earlier_boundaries(data, suffix):
    """Boundary locality: appending bytes can only affect the FINAL
    (possibly forced/partial) chunk — every earlier boundary is a pure
    function of the bytes before it."""
    base = cdc_boundaries(data)
    ext = cdc_boundaries(data + suffix)
    stable = base[:-1]                 # all but the final partial chunk
    assert ext[:len(stable)] == stable
