"""Perceptual image dedup over the real pixel codec.

``media_ahash_index`` computes a 64-bit average-hash per media asset
(8×8 block-mean luma thresholded at the global image mean) — the
image-corpus fingerprinting stage of a multimodal training-data
pipeline, running on REAL decoded pixels (the PIDR codec is fully
implemented in this environment; cf. reference ingestion at
``/root/reference/src/sahi_slicer.py:13-15``). ``media_ahash_pairs``
finds near-duplicate images by banding the hash into 4×16-bit LSH keys
(hamming-≤T pairs share ≥1 exact band for T<4 whp) and verifying
hamming distance inside the band group — same bucketed shape as the
text MinHash dedup, no all-pairs scan.

Rows-only driver check (pixel pipeline, not SQL-expressible); planted
duplicate/near-duplicate/distinct assets are pytest-verified.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

AHASH_GRID = 8          # 8x8 grid -> 64-bit hash
HAMMING_T = 3           # near-dup threshold (bits)
N_BANDS = 4             # 4 x 16-bit bands


def _ahash(img: np.ndarray) -> np.ndarray:
    """64-bit average hash of a 2-D uint8 image as uint64."""
    h, w = img.shape[:2]
    if img.ndim == 3:
        img = img.mean(axis=2)
    gh, gw = h // AHASH_GRID, w // AHASH_GRID
    if gh == 0 or gw == 0:  # degenerate tiny image: pad to grid
        img = np.pad(img, ((0, max(0, AHASH_GRID - h)),
                           (0, max(0, AHASH_GRID - w))), mode="edge")
        h, w = img.shape
        gh, gw = h // AHASH_GRID, w // AHASH_GRID
    crop = img[:gh * AHASH_GRID, :gw * AHASH_GRID].astype(np.float64)
    blocks = crop.reshape(AHASH_GRID, gh, AHASH_GRID, gw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).ravel()
    return np.uint64(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


class AHashStage:
    """Actor-pool stage: media store opens once per actor, each batch of
    refs decodes + hashes with no pixel ever entering the object store."""

    def __init__(self, media_root: str):
        from ..media.store import FileMediaStore
        self.store = FileMediaStore(media_root)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..media.codec import decode_image
        hashes, lumas = [], []
        for ref in df["media_ref"]:
            img = decode_image(self.store.get(ref))
            hashes.append(np.int64(np.uint64(_ahash(img)).view(np.int64)))
            lumas.append(round(float(np.asarray(img, np.float64).mean()), 4))
        return pd.DataFrame({"media_ref": df["media_ref"].values,
                             "ahash": pd.Series(hashes, dtype="int64"),
                             "mean_luma": pd.Series(lumas, dtype="float64")})


def _refs_dataset(media_root: str, rows_per_block: int = 256):
    """Asset list as a Dataset. Here the listing comes from the media
    directory; at scale it would be a manifest table read — only the
    (ref) strings ever sit in a block either way."""
    import ray.data as rd
    refs = sorted(
        os.path.relpath(os.path.join(root, f), media_root).replace(os.sep, "/")
        for root, _, names in os.walk(media_root)
        for f in names if f.endswith(".pidr"))
    nb = max(1, len(refs) // rows_per_block)
    return rd.from_items([{"media_ref": r} for r in refs],
                         override_num_blocks=nb)


def _index_ds(media_root: str):
    return _refs_dataset(media_root).map_batches(
        AHashStage, fn_constructor_args=(media_root,),
        batch_format="pandas", concurrency=(1, 8), num_cpus=1)


def media_ahash_index(sf_dir: str):
    """Per-asset (media_ref, 64-bit ahash, mean luma) over the flagship
    interleaved corpus' media pool."""
    from .flagship import build_interleaved_docs
    _, media_root = build_interleaved_docs(sf_dir)
    return _index_ds(media_root).sort("media_ref")


def media_ahash_pairs(media_root: str):
    """Near-duplicate asset pairs (hamming(ahash) <= HAMMING_T), banded
    LSH candidate generation + in-bucket verification. Returns a Dataset
    of (ref_a, ref_b, hamming)."""
    from .joins import DEFAULT_SHUFFLE_PARTITIONS

    idx = _index_ds(media_root)

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ahash"].to_numpy(np.int64).view(np.uint64)
        out = []
        for b in range(N_BANDS):
            band = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(pd.DataFrame({
                "bucket": band * N_BANDS + b,
                "media_ref": df["media_ref"].values,
                "ahash": df["ahash"].values}))
        return pd.concat(out, ignore_index=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("media_ref").sort_values("media_ref")
        refs = g["media_ref"].to_numpy()
        h = g["ahash"].to_numpy(np.int64).view(np.uint64)
        if len(refs) < 2:
            return pd.DataFrame({"ref_a": pd.Series([], dtype="object"),
                                 "ref_b": pd.Series([], dtype="object"),
                                 "hamming": pd.Series([], dtype="int64")})
        ii, jj = np.triu_indices(len(refs), k=1)
        # vectorized popcount: a hot band (e.g. many near-blank images)
        # can hold thousands of refs -> n^2/2 pairs; keep it in numpy
        xor = (h[ii] ^ h[jj]).copy().view(np.uint8).reshape(len(ii), 8)
        ham = np.unpackbits(xor, axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= HAMMING_T
        return pd.DataFrame({"ref_a": refs[ii[keep]], "ref_b": refs[jj[keep]],
                             "hamming": ham[keep]})

    pairs = (idx.map_batches(band_rows, batch_format="pandas")
             .groupby("bucket", num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
             .map_groups(lambda g: verify(g.drop(columns="bucket")),
                         batch_format="pandas"))
    # same pair can surface from several bands: dedup on the pair key
    return (pairs.groupby(["ref_a", "ref_b"],
                          num_partitions=DEFAULT_SHUFFLE_PARTITIONS)
            .map_groups(lambda g: g.head(1), batch_format="pandas"))


def media_near_dup_pairs(sf_dir: str):
    """Near-duplicate image pairs over the flagship interleaved corpus'
    media pool (rows-only: pixel pipeline). Banded-LSH candidates +
    in-bucket Hamming verify — the image analogue of dedup_minhash_lsh;
    planted-duplicate recall is pytest-carried (test_media_dedup.py)."""
    from .flagship import build_interleaved_docs
    _, media_root = build_interleaved_docs(sf_dir)
    return media_ahash_pairs(media_root).sort(["ref_a", "ref_b"])
