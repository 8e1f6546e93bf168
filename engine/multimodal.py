"""Multimodal column plumbing (task brief: image/audio/video as opaque
binary columns with typed metadata).

The decode stage is STUBBED — this container ships no image/audio codecs
(no PIL/ffmpeg/librosa), so :func:`decode_media` raises
``NotImplementedError`` unless a codec module is importable, and the
engine ops use :func:`fake_decode` — a deterministic, clearly-marked fake
that exercises the REAL Spark plumbing end-to-end: binary columns through
Arrow batches, ``mapInPandas`` batch iteration, typed struct/array output
schemas, and partition-preserving flow.  Swapping ``fake_decode`` for a
real codec changes no Spark code.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

try:  # pragma: no cover - codec not present in this container
    import PIL.Image as _pil  # noqa: F401

    _HAVE_CODEC = True
except Exception:
    _HAVE_CODEC = False


def decode_media(data: bytes) -> dict:
    """Real decode hook.  Raises in this container (no codec libs)."""
    if not _HAVE_CODEC:
        raise NotImplementedError(
            "media decode needs a codec library (PIL/ffmpeg); this "
            "environment has none — use fake_decode for plumbing tests"
        )
    raise NotImplementedError("codec integration not wired in this sandbox")


def fake_decode(data: bytes) -> dict:
    """Deterministic fake 'decode': metadata derived purely from bytes.

    width/height from the first bytes, mean 'pixel' over the payload —
    stable across runs/executors, so rows-only checks and tests hold.
    """
    if not data:
        return {"width": 0, "height": 0, "mean_px": 0.0}
    arr = np.frombuffer(data, dtype=np.uint8)
    return {
        "width": int(arr[0]) + 1,
        "height": int(arr[min(1, len(arr) - 1)]) + 1,
        "mean_px": float(np.round(arr.mean(), 4)),
    }


def frame_offsets(n_bytes: int, frame_size: int = 32, stride: int = 64) -> list[int]:
    """Frame-sampling plan for a fake 'video': every stride-th block that
    still fits a whole frame."""
    if n_bytes < frame_size:
        return []
    return list(range(0, n_bytes - frame_size + 1, stride))


def ingest_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: (doc_id, media binary) → (doc_id, n_bytes, digest).

    digest = sha256 hex of the raw bytes — matches DuckDB's sha256 over the
    same payload, which is what makes this stage SQL-oracle-able.
    """
    for pdf in batches:
        media = pdf["media"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": media.map(lambda b: len(b) if b is not None else 0).astype(
                    "int64"
                ),
                "digest": media.map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    if b is not None
                    else None
                ),
            }
        )


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: fake-decode each media blob to typed metadata."""
    for pdf in batches:
        metas = [fake_decode(bytes(b) if b is not None else b"") for b in pdf["media"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "mean_px": [m["mean_px"] for m in metas],
            }
        )


def frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: fake 'video' → one row per sampled frame with its hash."""
    for pdf in batches:
        ids, idxs, hashes = [], [], []
        for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
            data = bytes(b) if b is not None else b""
            for fi, off in enumerate(frame_offsets(len(data))):
                ids.append(doc_id)
                idxs.append(fi)
                hashes.append(
                    hashlib.sha256(data[off : off + 32]).hexdigest()[:16]
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_hash": pd.Series(hashes, dtype=object),
            }
        )
