"""Distributed connected components by star contraction (alternating
large-star / small-star, Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — public algorithm, re-derived here for
DataFrames).

Why this exists next to ``engine.ops.textops.label_propagate``: min-label
propagation needs rounds >= graph diameter, which is fine for near-clique
dedup graphs but hopeless for chain-shaped link graphs (a 10^6-hop
redirect/boilerplate chain would need 10^6 shuffles).  Star contraction
halves the effective diameter every alternation, converging in
O(log d) rounds on any graph — the shape you want at 10^10 edges.

Both operations are one shuffle each (a groupBy(min) and an equi-join —
the same primitives as label_propagate, no new physical machinery):

- ``large_star``: every node u computes m = min(N(u) ∪ {u}) and re-points
  each STRICTLY LARGER neighbour at m.  (Connectivity-preserving because
  u itself keeps an edge to m.)
- ``small_star``: orient every edge (hi → lo); every node u re-points its
  smaller-or-equal neighbours (and itself) at m = min of that set.

A fixpoint of both is a forest of depth-1 stars rooted at each
component's minimum id; the star edges ARE the (node, cluster_id) labels.
Convergence is detected by an edge-multiset hash (one tiny agg action per
round — at cluster scale this is the standard driver-side loop control).
Each round's edge set is localCheckpoint-ed: iterative plans otherwise
double Catalyst analysis work per round (measured on dedup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon_edges(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges as (hi, lo) pairs, self-loops dropped."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    # symmetric neighbourhood view; m = min(N(u) ∪ {u}); emit (v, m) for
    # every strictly larger neighbour v of u
    sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
        e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # edges already oriented hi → lo; every hi re-points its smaller
    # neighbours and itself at the min of {neighbours ∪ hi}
    m = e.groupBy("hi").agg(F.min("lo").alias("m"))
    pointed = (
        e.join(m, "hi")
        .select(F.col("lo").alias("node"), F.col("m"))
        .union(m.select(F.col("hi").alias("node"), F.col("m")))
    )
    return (
        pointed.filter(F.col("node") != F.col("m"))
        .select(F.col("node").alias("hi"), F.col("m").alias("lo"))
        .distinct()
    )


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """(id, cluster_id) labels; cluster_id = component-min id.

    ``nodes``: DataFrame(id); ``edges``: DataFrame(src, dst), undirected.
    Runs large-star/small-star alternations until the edge multiset is
    stable (hash-compared; one small agg action per round).
    """
    e = _canon_edges(edges).localCheckpoint()
    prev_sig = None
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint()
        # mod a prime before summing: ANSI mode makes a raw sum of
        # xxhash64 values overflow long
        sig = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("hi", "lo") % F.lit(1_000_000_007)).alias("h"),
        ).collect()[0]
        cur = (sig["n"], sig["h"])
        if cur == prev_sig:
            break
        prev_sig = cur
    else:
        raise RuntimeError(f"no fixpoint after {max_rounds} rounds")
    # fixpoint edges are (node → root) star edges; roots + isolated nodes
    # label themselves
    lab = e.select(F.col("hi").alias("id"), F.col("lo").alias("cluster_id"))
    return nodes.select("id").join(lab, "id", "left").select(
        "id", F.coalesce("cluster_id", "id").alias("cluster_id")
    )
