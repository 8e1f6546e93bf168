"""Robots gating (SURVEY.md §2 B robots_gate; BASELINE.json:14).

Per-host disallow rules are broadcast (robots is dim-table sized even for
the full web: ~10^8 hosts × small arrays; on a real cluster this join can
fall back to shuffle automatically if it outgrows the broadcast threshold —
the code is the same DataFrame expression either way).  The predicate is a
higher-order-function ``exists`` over the disallow array, JVM-side — no
Python in the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# path component of a canonical url: from the first '/' after the host up to
# (not including) '?'.  Canonical urls never carry fragments.  Mirrors
# refspec.crawler._path_of.
PATH_RE = r"^[a-z]+://[^/]+(/[^?]*)"


def with_path(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("_path", F.regexp_extract(F.col(url_col), PATH_RE, 1))


def robots_gate(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Tag candidates with ``robots_blocked``: true iff any disallow prefix
    of the candidate's host prefixes its path.  Blocked rows leave the
    frontier and enter the seen set without a lineage row (pinned in
    refspec/crawler.py docstring) — callers split on the flag."""
    joined = with_path(candidates).join(
        F.broadcast(robots.select("host", "disallow")), "host", "left"
    )
    path = F.col("_path")
    blocked = F.when(F.col("disallow").isNull(), F.lit(False)).otherwise(
        F.exists("disallow", lambda d: path.startswith(d))
    )
    return joined.withColumn("robots_blocked", blocked).drop("_path", "disallow")
