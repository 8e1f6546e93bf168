"""Probabilistic seen-set operators (SURVEY.md §2 group E) as registry
entries.  `seen_exact_verify` is the load-bearing one: it runs the full
bloom-prune → exact-verify composition and its oracle is the PLAIN
anti-join SQL — passing proves the filter path is correctness-neutral."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from engine.filters import (
    CuckooShard,
    bloom_shards_df,
    bloom_tag,
    build_bloom_shards,
)
from engine.io import load_table
from engine.ops import op


@op(
    "bloom_build_shards",
    "SELECT CAST(o_orderkey % 32 AS INT) AS bucket, count(*) AS n_keys "
    "FROM orders GROUP BY CAST(o_orderkey % 32 AS INT)",
    "E",
)
def bloom_build_shards_op(spark, sf):
    # shard layout check: per-bucket key counts must match the oracle's
    # pmod grouping (the bloom bytes themselves are pytest-verified)
    seen = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("url_hash")
    )
    return bloom_shards_df(seen, n_shards=32).select("bucket", "n_keys")


@op("bloom_prune", None, "E")  # fp-rate-dependent counts → rows-only
def bloom_prune_op(spark, sf):
    seen = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("url_hash")
    )
    shards = build_bloom_shards(seen, n_shards=32)
    probe = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("url_hash"), "l_linenumber"
    )
    tagged = bloom_tag(probe, shards)
    return tagged.groupBy("_maybe_seen").agg(F.count("*").alias("cnt"))


@op(
    "seen_exact_verify",
    "SELECT l_orderkey, l_linenumber FROM lineitem WHERE NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_orderkey = l_orderkey "
    "AND o_totalprice > 100000)",
    "E",
)
def seen_exact_verify(spark, sf):
    # bloom-pruned anti-join ≡ exact anti-join (the invariant): maybe-seen
    # rows take the exact anti-join, definitely-unseen rows skip it
    seen = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_orderkey").alias("url_hash"))
    )
    shards = build_bloom_shards(seen, n_shards=32)
    probe = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("url_hash"), "l_linenumber"
    )
    tagged = bloom_tag(probe, shards)
    maybe = tagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    definite = tagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    survivors = maybe.join(seen, "url_hash", "left_anti").unionByName(definite)
    return survivors.select(
        F.col("url_hash").alias("l_orderkey"), "l_linenumber"
    )


@op("cuckoo_shard_update", None, "E")
def cuckoo_shard_update(spark, sf):
    """Per-bucket cuckoo shards with DELETE (re-crawl eviction): insert all
    keys, evict every key ≡ 0 mod 3, emit per-key membership.  Fingerprint
    collisions make lingering deleted keys possible (cuckoo guarantees no
    false negatives for PRESENT keys only) → rows-only; exact properties
    are pytest-checked (tests/test_filters.py)."""

    def update(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["url_hash"].to_numpy(dtype=np.int64)
        shard = CuckooShard(len(keys))
        u = keys.astype(np.uint64)
        for h in u:
            assert shard.insert(int(h))
        for h in u[keys % 3 == 0]:
            shard.delete(int(h))
        present = shard.contains_batch(keys)
        return pd.DataFrame(
            {
                "bucket": pdf["bucket"],
                "url_hash": keys,
                "present": present,
            }
        )

    seen = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("url_hash"),
        F.pmod("o_orderkey", F.lit(16)).alias("bucket"),
    )
    return (
        seen.groupBy("bucket")
        .applyInPandas(update, "bucket int, url_hash long, present boolean")
        .groupBy("bucket", "present")
        .agg(F.count("*").alias("cnt"))
    )
