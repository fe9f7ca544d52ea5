"""Media store: resolves ``media_ref`` strings to media bytes.

The input table carries only ``media_ref`` addresses (FIXTURES.md §1); bytes
live out-of-band, one object per ref — the same shape as S3/GCS object
storage at 100 TB scale, where each decode stage does a GET per ref. Here the
backing store is a local directory with one file per ref, written atomically
(tmp + rename) so a resumed run never sees torn blobs.

Stages take the store *root path* (a string — cheap to serialize into every
task) and open refs lazily per batch; media bytes are never broadcast and
never flow through a shuffle (SURVEY.md §7.3).
"""

from __future__ import annotations

import os
import re
import uuid

_SAFE_REF = re.compile(r"^[A-Za-z0-9._/\-]+$")


class FileMediaStore:
    """One file per media_ref under a root directory."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, ref: str) -> str:
        if not _SAFE_REF.match(ref) or ".." in ref or ref.startswith("/"):
            raise ValueError(f"invalid media_ref: {ref!r}")
        return os.path.join(self.root, ref)

    def put(self, ref: str, data: bytes) -> None:
        path = self._path(ref)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def get(self, ref: str) -> bytes:
        with open(self._path(ref), "rb") as f:
            return f.read()

    def size(self, ref: str) -> int:
        """Blob size in bytes (object-storage HEAD equivalent)."""
        return os.path.getsize(self._path(ref))

    def get_prefix(self, ref: str, n: int) -> bytes:
        """Ranged read of the first n bytes (object storage supports range
        GETs; the tile planner reads only the media header this way)."""
        with open(self._path(ref), "rb") as f:
            return f.read(n)

    def exists(self, ref: str) -> bool:
        return os.path.exists(self._path(ref))
