"""Similarity search over the `embeddings` table (task brief: ANN as a
first-class engine component).

- ``embed_norm`` / ``embed_cosine_topk``: brute-force baselines using only
  JVM higher-order functions (transform / zip_with / aggregate) — no
  Python anywhere, both DuckDB-oracled.
- ``ann_lsh_bucket``: the scale path — random-hyperplane (sign) LSH with
  deterministic sha-derived hyperplanes; candidates meet only inside a
  bucket (hash join on the bucket key), then exact cosine re-ranks.  At
  100 TB the bucket join replaces the quadratic cross join; recall vs
  brute force is pytest-checked (tests/test_simsearch.py).
- ``embed_cosine_neardup``: embedding near-duplicate detection (cosine ≥
  τ between distinct vectors) — the embedding leg of the dedup suite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, IntegerType

from engine.io import load_table
from engine.ops import op
from engine.ops.goldens import golden_oracle as _golden
from engine.textanalysis import _derived_u64

N_QUERIES = 5  # vec_id < 5 are the query set in the registry entries
TOP_K = 5
DIM = 64
# multi-table sign-LSH: L independent tables of P hyperplanes each.  A
# candidate pairs with a query if they share a bucket in ANY table —
# recall = 1-(1-p^P)^L where p = 1-θ/π, tunable without touching the
# join shape.  (A single wide table is precision-heavy and collapses to
# ~zero recall when buckets outnumber vectors.)
N_PLANES = 6  # 64 buckets per table
N_TABLES = 4


def _dbl(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _l2(a):
    return F.sqrt(_dot(a, a))


def cosine_col(a, b):
    return _dot(a, b) / (_l2(a) * _l2(b))


@op(
    "embed_norm",
    "SELECT vec_id, round(sqrt(list_sum(list_transform(embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm "
    "FROM embeddings",
    "K",
)
def embed_norm(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    return emb.select(
        "vec_id", F.round(_l2(_dbl(F.col("embedding"))), 4).alias("l2_norm")
    )


_COSINE_SQL = (
    "list_sum(list_transform(list_zip(q.embedding, c.embedding), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


@op(
    "embed_cosine_topk",
    "SELECT query_id, cand_id, rnk FROM (SELECT q.vec_id AS query_id, "
    "c.vec_id AS cand_id, row_number() OVER (PARTITION BY q.vec_id ORDER BY "
    f"round({_COSINE_SQL}, 6) DESC, c.vec_id ASC) AS rnk "
    f"FROM embeddings q JOIN embeddings c ON c.vec_id >= {N_QUERIES} "
    f"WHERE q.vec_id < {N_QUERIES}) WHERE rnk <= {TOP_K}",
    "K",
)
def embed_cosine_topk(spark, sf):
    # brute-force top-k: broadcast the (small) query set against every
    # candidate partition — the exact baseline the ANN path is judged by.
    # Ranking orders by round(cos, 6) with vec_id tie-break so both
    # engines rank identical values (raw doubles can differ in the last
    # ulp across engines).
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", _dbl(F.col("embedding")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "cand_id",
        F.round(cosine_col(F.col("q_emb"), F.col("c_emb")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "rnk")
    )


# deterministic hyperplanes: sha-derived pseudo-gaussians, same on every
# executor and every run (no RNG state)
def _hyperplanes() -> np.ndarray:
    vals = np.asarray(
        [
            _derived_u64("hp", i) / float(1 << 64) - 0.5
            for i in range(N_TABLES * N_PLANES * DIM)
        ]
    )
    return vals.reshape(N_TABLES, N_PLANES, DIM)


@F.pandas_udf(ArrayType(IntegerType()))
def _lsh_bucket_udf(embs: pd.Series) -> pd.Series:
    planes = _hyperplanes()  # (L, P, D)
    mat = np.stack(embs.to_numpy())  # (n, D)
    out = np.zeros((len(embs), N_TABLES), dtype=np.int32)
    for t in range(N_TABLES):
        signs = (mat @ planes[t].T) > 0  # (n, P)
        code = np.zeros(len(embs), dtype=np.int32)
        for p in range(N_PLANES):
            code |= signs[:, p].astype(np.int32) << p
        # disambiguate tables so the bucket key is (table, code) in one int
        out[:, t] = code | (t << N_PLANES)
    return pd.Series(list(out))


def lsh_buckets(emb: DataFrame) -> DataFrame:
    """One row per (vector, table): explode the L bucket codes.  The
    downstream candidate join keys on the bucket int (table id baked into
    the high bits), exactly the shuffle topology a 10^10-scale ANN uses."""
    return emb.select(
        "vec_id",
        "embedding",
        F.explode(_lsh_bucket_udf("embedding")).alias("bucket"),
    )


@op("ann_lsh_bucket", _golden("ann_lsh_bucket"), "K")
def ann_lsh_bucket(spark, sf):
    """IVF/LSH-style ANN: queries probe only their own bucket; exact cosine
    re-ranks within it.  Rows-only (approximate); recall pytest-checked."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", _dbl(F.col("embedding")).alias("embedding")
    )
    bucketed = lsh_buckets(emb)
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    c = bucketed.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .select(
            "query_id",
            "cand_id",
            F.round(cosine_col(F.col("q_emb"), F.col("c_emb")), 6).alias("cos"),
        )
        # a pair can meet in several tables — dedup before ranking
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "rnk", "cos")
    )


@op(
    "embed_cosine_neardup",
    "SELECT q.vec_id AS vec_a, c.vec_id AS vec_b, "
    f"round({_COSINE_SQL}, 4) AS cos FROM embeddings q JOIN embeddings c "
    f"ON q.vec_id < c.vec_id WHERE round({_COSINE_SQL}, 6) >= 0.5",
    "K",
)
def embed_cosine_neardup(spark, sf):
    """Embedding-cosine near-dup pairs (threshold 0.5) — the SCALE-SAFE
    shape: candidates meet only inside an LSH bucket (equi hash join on
    the bucket key — no BroadcastNestedLoopJoin anywhere, plan-asserted
    in tests/test_plans.py), then exact cosine re-ranks, so false
    candidates cannot survive.  Recall is the LSH guarantee
    (probabilistic in general); the deterministic sha-derived hyperplanes
    make it a fixed fact per dataset, and tests/test_simsearch.py asserts
    the result set EQUALS the all-pairs oracle (neardup_allpairs) on the
    test tables — which is also why the all-pairs DuckDB oracle above
    still hash-matches."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", _dbl(F.col("embedding")).alias("embedding")
    )
    bucketed = lsh_buckets(emb)
    # candidate id pairs: equi-join on bucket, dedup before the (heavier)
    # cosine re-rank — a pair meeting in several tables scores once
    a = bucketed.select(F.col("vec_id").alias("vec_a"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("vec_b"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b"))
    cos6 = F.round(cosine_col(F.col("e_a"), F.col("e_b")), 6)
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cos6", cos6)
        .filter(F.col("cos6") >= 0.5)
        .select("vec_a", "vec_b", F.round("cos6", 4).alias("cos"))
    )


# ------------------------------------------------------------------- IVF
N_CELLS = 16  # coarse centroids (inverted lists)
N_PROBE = 3  # cells each query probes


def _ivf_assign_udf(centroids: np.ndarray, nprobe: int):
    """Pandas UDF assigning each vector to its ``nprobe`` nearest coarse
    centroids (by cosine).  The centroid matrix is K x D — dim-table
    sized by construction (K=16 regardless of corpus size), so shipping
    it in the closure is the ANN-standard move, not a scale hazard."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.to_numpy()).astype(np.float64)  # (n, D)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ cn.T  # (n, K)
        order = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    return assign


def ivf_centroids(emb: DataFrame) -> np.ndarray:
    """Deterministic coarse quantizer: seed with the K vectors whose
    sha-derived priority is smallest (data-independent pseudo-random,
    identical on every run/executor), then one Lloyd step — assign all
    vectors to their nearest seed and average per cell — computed as a
    DataFrame aggregation (posexplode + avg), no driver-side loops over
    the corpus.  Only the K x D centroid matrix is ever collected."""
    seeds = (
        emb.select(
            "vec_id",
            "embedding",
            F.unhex(F.sha2(F.concat(F.lit("ivf:"), F.col("vec_id")), 256))
            .substr(1, 8)
            .alias("_pri"),
        )
        .orderBy("_pri", "vec_id")
        .limit(N_CELLS)
        .select("vec_id", "embedding")
        .collect()
    )
    seed_mat = np.asarray([r["embedding"] for r in seeds], dtype=np.float64)
    assign1 = _ivf_assign_udf(seed_mat, 1)
    assigned = emb.select(
        F.element_at(assign1("embedding"), 1).alias("cell"),
        F.posexplode("embedding").alias("dim", "x"),
    )
    # Order-free exact mean: floor-scale each coordinate to a 2^-20 grid,
    # sum as LONGs (commutative/associative — bit-identical at any
    # partitioning or parallelism, unlike F.avg's order-dependent double
    # sum), divide once at the end.  Grid loss ~1e-6 is irrelevant for a
    # coarse quantizer, and it makes the centroid matrix — hence the whole
    # op — a pinnable fixed fact per dataset (fixtures/golden_oracles.json).
    scale = 1 << 20
    means = (
        assigned.groupBy("cell", "dim")
        .agg(
            (
                (F.sum(F.floor(F.col("x") * scale).cast("long")) / F.count("*"))
                / F.lit(float(scale))
            ).alias("m")
        )
        .collect()
    )
    cents = seed_mat.copy()  # empty cells keep their seed vector
    by_cell: dict[int, dict[int, float]] = {}
    for r in means:
        by_cell.setdefault(int(r["cell"]), {})[int(r["dim"])] = float(r["m"])
    for c, dims in by_cell.items():
        for d, v in dims.items():
            cents[c, d] = v
    return cents


@op("ann_ivf", _golden("ann_ivf"), "K")
def ann_ivf(spark, sf):
    """IVF-style ANN (task brief: 'an IVF or LSH-bucketed variant as the
    scale path', complementing ann_lsh_bucket): a deterministic 16-cell
    coarse quantizer partitions the corpus into inverted lists; queries
    probe their N_PROBE nearest cells; candidates meet via an equi hash
    join on the cell id and exact cosine re-ranks.  Rows-only
    (approximate); recall vs the exact top-k is pytest-pinned
    (tests/test_simsearch.py)."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", _dbl(F.col("embedding")).alias("embedding")
    )
    cents = ivf_centroids(emb)
    # candidates post to their single nearest cell; queries probe N_PROBE
    cand_assign = _ivf_assign_udf(cents, 1)
    q_assign = _ivf_assign_udf(cents, N_PROBE)
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.element_at(cand_assign("embedding"), 1).alias("cell"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(q_assign("embedding")).alias("cell"),
    )
    scored = c.join(F.broadcast(q), "cell").select(
        "query_id",
        "cand_id",
        F.round(cosine_col(F.col("q_emb"), F.col("c_emb")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "rnk", "cos")
    )


def neardup_allpairs(spark, sf):
    """All-pairs exact near-dup — the O(n²) pytest oracle the LSH-bucketed
    operator is equality-checked against (NOT registered: quadratic
    candidate generation must never be the first-class op)."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", _dbl(F.col("embedding")).alias("embedding")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos6 = F.round(cosine_col(F.col("e_a"), F.col("e_b")), 6)
    return (
        pairs.withColumn("cos6", cos6)
        .filter(F.col("cos6") >= 0.5)
        .select("vec_a", "vec_b", F.round("cos6", 4).alias("cos"))
    )
