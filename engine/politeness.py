"""Per-host politeness-budgeted priority selection (SURVEY.md §2 G1, §4.2).

The determinism keystone: per host, keep the top-B(host) candidates under
the TOTAL order (priority DESC, discovered_round ASC, url ASC).  A total
order means row_number is deterministic regardless of partitioning — tested
at local[8] vs local[32].

Hot-host skew (BASELINE.json:14 "host-hash salted partitioning"): a naive
window puts an entire hot host in one task.  The two-phase variant first
takes the top-B within each of S salt sub-groups (partitioned by
(host, pmod(url_hash, S)) — S× the parallelism, each task ≤ 1/S of the hot
host), then re-windows the ≤ S·B survivors per host for the exact global
top-B.  Phase 1 is a strict superset of the final top-B (any row in the
host-global top-B is in the top-B of its own salt group), so the two-phase
result equals the single-phase result — property-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SELECT_ORDER = lambda: [  # noqa: E731 — the pinned total order, one place
    F.col("priority").desc(),
    F.col("discovered_round").asc(),
    F.col("url").asc(),
]


def with_budget(
    df: DataFrame, default_budget: int, overrides: dict[str, int]
) -> DataFrame:
    """Attach B(host) as a column: literal map lookup (JVM-side) with a
    default — overrides are config-sized, never a join."""
    if overrides:
        kv = []
        for h, b in sorted(overrides.items()):
            kv += [F.lit(h), F.lit(b)]
        m = F.create_map(*kv)
        budget = F.coalesce(m[F.col("host")], F.lit(default_budget))
    else:
        budget = F.lit(default_budget)
    return df.withColumn("budget", budget)


def select_top_b(
    candidates: DataFrame,
    default_budget: int,
    overrides: dict[str, int] | None = None,
    salt: int = 8,
) -> DataFrame:
    """Top-B(host) per host under the pinned total order; two-phase salted
    when ``salt > 1``.  Returns the input columns (budget/rank dropped)."""
    df = with_budget(candidates, default_budget, overrides or {})
    order = SELECT_ORDER()
    if salt and salt > 1:
        w1 = Window.partitionBy(
            "host", F.pmod(F.col("url_hash"), F.lit(salt))
        ).orderBy(*order)
        df = df.withColumn("_rn1", F.row_number().over(w1)).filter(
            F.col("_rn1") <= F.col("budget")
        )
    w2 = Window.partitionBy("host").orderBy(*order)
    out = df.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") <= F.col("budget")
    )
    return out.drop("_rn1", "_rn", "budget")
