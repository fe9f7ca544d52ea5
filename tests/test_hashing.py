"""MinHash / SimHash / LSH kernel tests."""

import numpy as np

from p_id_text_extraction_ray.functions import hashing as H


def test_shingles_basic():
    s = H.word_shingles("a b c d", k=3)
    assert len(s) == 2
    assert len(H.word_shingles("a b", k=3)) == 1
    assert len(H.word_shingles("", k=3)) == 0


def test_stable_hash_deterministic():
    assert H.stable_hash64("abc") == H.stable_hash64("abc")
    assert H.stable_hash64("abc") != H.stable_hash64("abd")


def test_minhash_identical_sets_equal_signatures():
    a = H.word_shingles("the quick brown fox jumps over the lazy dog")
    sig1 = H.minhash_signature(a)
    sig2 = H.minhash_signature(a.copy())
    assert (sig1 == sig2).all()


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    base = [f"w{i}" for i in range(200)]
    t1 = " ".join(base)
    t2 = " ".join(base[:150] + [f"x{i}" for i in range(50)])
    s1, s2 = H.word_shingles(t1), H.word_shingles(t2)
    true_j = H.jaccard(s1, s2)
    sigs = H.minhash_signatures_batch([s1, s2], num_perm=256)
    est = (sigs[0] == sigs[1]).mean()
    assert abs(est - true_j) < 0.12
    del rng


def test_batch_matches_single():
    sets = [H.word_shingles(t) for t in
            ["alpha beta gamma delta", "one two three four five", ""]]
    batch = H.minhash_signatures_batch(sets, num_perm=64)
    for i, s in enumerate(sets):
        assert (batch[i] == H.minhash_signature(s, num_perm=64)).all()


def test_lsh_bands_candidates():
    s1 = H.word_shingles(" ".join(f"w{i}" for i in range(100)))
    s2 = H.word_shingles(" ".join(f"w{i}" for i in range(99)) + " zz")
    s3 = H.word_shingles(" ".join(f"q{i}" for i in range(100)))
    sigs = H.minhash_signatures_batch([s1, s2, s3], num_perm=128)
    keys = H.lsh_band_keys(sigs, num_bands=32)
    assert (keys[0] == keys[1]).any()        # near-dups share a band
    assert not (keys[0] == keys[2]).any()    # unrelated docs don't


def test_simhash_similarity():
    a = H.simhash64("the quick brown fox jumps over the lazy dog")
    b = H.simhash64("the quick brown fox jumps over the lazy cat")
    c = H.simhash64("completely different words entirely here now")
    d_ab = H.hamming64(np.array([a], dtype=np.uint64), b)[0]
    d_ac = H.hamming64(np.array([a], dtype=np.uint64), c)[0]
    assert d_ab < d_ac
    assert H.hamming64(np.array([a], dtype=np.uint64), a)[0] == 0


def test_jaccard_edges():
    e = np.zeros(0, dtype=np.uint64)
    assert H.jaccard(e, e) == 1.0
    s = H.word_shingles("a b c")
    assert H.jaccard(s, s) == 1.0
    assert H.jaccard(s, e) == 0.0
