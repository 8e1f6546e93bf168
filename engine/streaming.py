"""Structured-Streaming tier (SURVEY.md §2 group J).

The north rule's unit of work is the batch round (BASELINE.json:6), so
streaming is an extension tier: the same engine operators driven as
micro-batches.  Everything here is testable in-sandbox by replaying a
parquet table through a file streaming source with a one-shot
``availableNow`` trigger into an in-memory sink — semantically the
real `readStream → transform → writeStream` pipeline, minus an
always-on source.

Determinism notes:
- windowed aggregations run in ``complete`` output mode (a one-shot
  replay emits every window exactly once — append mode would hold
  final windows back behind the watermark);
- the streaming dedup op returns only KEY columns, because
  ``dropDuplicatesWithinWatermark`` keeps an arbitrary first row per
  key — projecting to the keys makes the result a deterministic set.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_COUNTER = 0


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A file streaming source replaying ``<sf_dir>/<name>.parquet``.

    The file source wants a directory it can list, so the single parquet
    file is staged (symlinked) into a temp dir once per (sf_dir, table).
    """
    import hashlib

    src = os.path.join(sf_dir, f"{name}.parquet")
    # stage dir name from sha256 (reproducible across runs — Python's
    # hash() is PYTHONHASHSEED-randomized and would leak stage dirs)
    digest = hashlib.sha256(os.path.abspath(src).encode()).hexdigest()[:12]
    stage = os.path.join(
        tempfile.gettempdir(), "spark_graft_stream", f"{name}_{digest}"
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, f"{name}.parquet")
    # lexists (not exists): a dangling symlink — source deleted and later
    # recreated — must be replaced, not tripped over
    if os.path.lexists(link):
        os.unlink(link)
    os.symlink(src, link)
    # exactly ONE staged file ⇒ the whole replay lands in ONE micro-batch.
    # stream_dedup's equivalence to SELECT DISTINCT depends on this:
    # dropDuplicatesWithinWatermark evicts state at batch boundaries, so a
    # multi-file stage could re-emit keys recurring beyond the watermark.
    staged = [f for f in os.listdir(stage) if not f.startswith(".")]
    assert staged == [f"{name}.parquet"], staged
    schema = spark.read.parquet(src).schema
    df = spark.readStream.schema(schema).parquet(stage)
    # watermarks require TIMESTAMP (tz-aware); the testdata parquet carries
    # TIMESTAMP_NTZ.  Session tz is pinned UTC (engine/session.py), so the
    # cast is epoch-preserving and the DuckDB oracles agree.
    from pyspark.sql import functions as F

    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def run_to_df(
    sdf: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink and return the sink's contents as a batch DataFrame."""
    global _COUNTER
    _COUNTER += 1
    qname = f"graft_stream_{_COUNTER}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(qname)


def run_foreach_batch(
    sdf: DataFrame, fn, output_mode: str = "append"
) -> None:
    """`foreachBatch` runner (the crawl's stream_rounds hook): each
    micro-batch DataFrame is handed to ``fn(batch_df, batch_id)``."""
    q = (
        sdf.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
