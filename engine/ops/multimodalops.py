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


@op("mm_decode_stub", None, "K")
def mm_decode_stub(spark, sf):
    # typed metadata out of the (fake) decoder — real Arrow batch flow,
    # rows-only check (the fake's semantics aren't ANSI SQL)
    media = _with_media(spark, sf)
    return media.mapInPandas(
        decode_batches, "doc_id long, width int, height int, mean_px double"
    )


@op("mm_frame_sample", None, "K")
def mm_frame_sample(spark, sf):
    media = _with_media(spark, sf)
    return media.mapInPandas(
        frame_sample_batches, "doc_id long, frame_idx int, frame_hash string"
    )
