"""Perceptual image dedup on planted assets: exact duplicate, slightly
perturbed near-duplicate, and structurally different images."""

import os

import numpy as np
import pytest

from p_id_text_extraction_ray.media.codec import decode_image, encode_image
from p_id_text_extraction_ray.media.store import FileMediaStore
from p_id_text_extraction_ray.pipelines.media_dedup import (
    HAMMING_T, _ahash, media_ahash_pairs)


@pytest.fixture(scope="module")
def planted_media(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("media"))
    store = FileMediaStore(root)
    rng = np.random.default_rng(5)

    base = (rng.random((256, 320)) * 80).astype(np.uint8)
    base[40:120, 60:260] = 230          # bright block: structure
    base[180:220, 20:300] = 200

    near = base.copy()
    near[:8, :8] = 255                  # tiny corner perturbation

    other = (rng.random((256, 320)) * 80).astype(np.uint8)
    other[10:250, 140:180] = 240        # different structure

    for name, img in [("a_base", base), ("b_dup", base),
                      ("c_near", near), ("d_other", other)]:
        store.put(f"media/{name}.pidr", encode_image(img))
    return root


def test_ahash_deterministic_and_discriminative(planted_media):
    store = FileMediaStore(planted_media)
    h = {n: _ahash(decode_image(store.get(f"media/{n}.pidr")))
         for n in ("a_base", "b_dup", "c_near", "d_other")}
    assert h["a_base"] == h["b_dup"]
    assert bin(int(h["a_base"] ^ h["c_near"])).count("1") <= HAMMING_T
    assert bin(int(h["a_base"] ^ h["d_other"])).count("1") > HAMMING_T


def test_pairs_find_planted_dups_only(ray_session, planted_media):
    out = media_ahash_pairs(planted_media).to_pandas()
    pairs = {tuple(sorted(p)) for p in
             zip(out["ref_a"], out["ref_b"])}
    a, b, c, d = (f"media/{n}.pidr"
                  for n in ("a_base", "b_dup", "c_near", "d_other"))
    assert (a, b) in pairs                      # exact dup found
    assert (a, c) in pairs and (b, c) in pairs  # near-dup found
    assert not any(d in p for p in pairs)       # distinct image untouched
