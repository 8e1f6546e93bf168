"""Multimodal operators (task brief): opaque binary columns + typed
metadata through real mapInPandas plumbing; decode stage stubbed
(engine/multimodal.py — deterministic fake, swap-in codec point).

The 'media' binary column is synthesized as encode(text) so the ingest
stage has a genuine SQL oracle (octet_length/sha256 over the same bytes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.io import load_table
from engine.multimodal import (
    decode_batches,
    frame_sample_batches,
    ingest_batches,
)
from engine.ops import op
from engine.ops.goldens import golden_oracle as _golden


def _with_media(spark, sf):
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id", F.encode("text", "utf-8").alias("media")
    )


@op(
    "mm_ingest_bytes",
    "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
    "sha256(text) AS digest FROM documents",
    "K",
)
def mm_ingest_bytes(spark, sf):
    media = _with_media(spark, sf)
    return media.mapInPandas(
        ingest_batches, "doc_id long, n_bytes long, digest string"
    )


@op("mm_decode_stub", _golden("mm_decode_stub"), "K")
def mm_decode_stub(spark, sf):
    # typed metadata out of the (fake) decoder — real Arrow batch flow.
    # The fake's semantics aren't ANSI SQL, but they ARE a pure function
    # of the bytes, so the oracle is a pinned VALUES set generated (and
    # asserted against an independent numpy/hashlib recompute) by
    # scripts/gen_golden_oracles.py — same trust model as doc_fingerprint.
    media = _with_media(spark, sf)
    return media.mapInPandas(
        decode_batches, "doc_id long, width int, height int, mean_px double"
    )


@op("mm_frame_sample", _golden("mm_frame_sample"), "K")
def mm_frame_sample(spark, sf):
    # one row per sampled 32-byte 'frame' (stride 64) — pinned VALUES
    # oracle over the deterministic fake, recompute-asserted (see
    # mm_decode_stub note)
    media = _with_media(spark, sf)
    return media.mapInPandas(
        frame_sample_batches, "doc_id long, frame_idx int, frame_hash string"
    )
