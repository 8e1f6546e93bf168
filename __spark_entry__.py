"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in the ``engine`` package; the registry
(engine/ops/__init__.py) maps SURVEY.md §2 operator keys to
(spark, sf_dir) callables and their DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    One full crawl round (anti-join → robots gate → salted politeness
    window → fetch join → Arrow extraction → lineage) over a micro-corpus
    synthesized deterministically from sf0.001 `documents`
    (engine/entryquery.py).
    """
    from engine.entryquery import flagship

    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from engine.ops import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per oracle-able op (others → rows-only check)."""
    from engine.ops import oracle_sql as _oracle_sql

    return _oracle_sql()
