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


def _persistent_ids(sc) -> set[int]:
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}


def _unpersist_ids(sc, ids: set[int]) -> None:
    # free a finished round's localCheckpoint blocks NOW instead of waiting
    # for GC/ContextCleaner — 50 rounds of retained checkpoint blocks is a
    # real memory tax at 10^10 edges (ADVICE r2).  localCheckpoint data
    # lives in the block store under the checkpointed RDD, which df
    # .unpersist() cannot reach; the persistent-RDD registry can.
    m = sc._jsc.getPersistentRDDs()
    for k in m.keySet().toArray():
        if int(k) in ids:
            m.get(k).unpersist(False)


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
    sc = edges.sparkSession.sparkContext
    before = _persistent_ids(sc)
    e = _canon_edges(edges).localCheckpoint()
    prev_ids = _persistent_ids(sc) - before
    prev_sig = None
    for _ in range(max_rounds):
        before = _persistent_ids(sc)
        e = _small_star(_large_star(e)).localCheckpoint()
        new_ids = _persistent_ids(sc) - before
        # set digest: count + bit_xor of the full 64-bit hash + mod-prime
        # sum (xor alone is order/overflow-safe under ANSI; the mod-prime
        # sum is an independent second channel so a single-channel
        # collision can't terminate the loop early with wrong labels —
        # edges are distinct(), so a set digest is the right object)
        sig = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(hi, lo))").alias("x"),
            F.sum(F.xxhash64("hi", "lo") % F.lit(1_000_000_007)).alias("h"),
        ).collect()[0]
        cur = (sig["n"], sig["x"], sig["h"])
        # the new checkpoint is already materialized (eager) — the finished
        # round's blocks can be released before the equality test
        _unpersist_ids(sc, prev_ids)
        prev_ids = new_ids
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


def components_auto(
    nodes: DataFrame,
    edges: DataFrame,
    prop_rounds: int = 10,
    stats: dict | None = None,
) -> DataFrame:
    """(id, cluster_id) with automatic escalation (VERDICT r2 §6).

    Near-dup pair graphs are near-cliques: ``prop_rounds`` of min-label
    propagation (one shuffle each) finish them cheaply.  Chain-shaped
    graphs (redirect/boilerplate chains) have diameter ≫ prop_rounds —
    ONE extra propagation round detects the un-converged case (any label
    still shrinking) and the job escalates to star contraction, which
    halves the effective diameter per alternation: O(log d) total rounds
    instead of O(d).  The caller never has to know the graph's shape.

    ``stats`` (optional dict) receives {'escalated': bool} — test/metrics
    hook, no effect on the result.
    """
    from engine.ops.textops import label_propagate

    lab = label_propagate(nodes, edges, rounds=prop_rounds)
    # convergence probe: would one more round change anything?  One
    # equi-join + agg action — the same driver-side loop control the
    # fixpoint test in connected_components uses.
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    improved = (
        sym.join(lab, sym.dst == lab.id)
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("cluster_id").alias("n_min"))
        .join(lab, "id")
        .filter(F.col("n_min") < F.col("cluster_id"))
        .limit(1)
        .count()
    )
    escalated = improved > 0
    if stats is not None:
        stats["escalated"] = escalated
    if not escalated:
        return lab
    return connected_components(nodes, edges)
