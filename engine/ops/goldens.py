"""Pinned closed-form oracles for deterministic ops whose semantics are
not ANSI-SQL-expressible (sketches, UDF extractors, probabilistic-filter
counts).

Every op here is DETERMINISTIC for a fixed input (per-row UDF sketches,
commutative bit-OR / register-max merges, JVM fold arithmetic over
arrays), so its sf0.01 result set is a fixed fact that can be pinned as a
``VALUES`` oracle — the same trust model as tests/golden/s_corpus.json.
``scripts/gen_golden_oracles.py`` generates fixtures/golden_oracles.json
and, for every op where an independent pure-Python recomputation exists
(engine.textanalysis / engine.pure / engine.filters math over pandas
data — no Spark anywhere in the recompute), ASSERTS the pin equals that
recomputation before writing it; the pin is therefore not a circular
Spark-pins-Spark regression value except where explicitly documented
(approx_frontier_card's HLL++ register state is only defined by Spark;
ann_ivf's centroid means are exact order-free integer sums, replicated
in the generator).

The driver's correctness gate runs oracles at sf0.01 only (task brief),
which is the scale these pins are generated at; `SF_DIR`-overridden local
runs of scripts/check_oracles.py at another scale would rightly fail.
"""

from __future__ import annotations

import json
import os

_GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "golden_oracles.json",
)

_DUCK_TYPES = {
    "long": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
}

_cache: dict | None = None


def _load() -> dict:
    global _cache
    if _cache is None:
        if os.path.exists(_GOLDEN_PATH):
            with open(_GOLDEN_PATH) as f:
                _cache = json.load(f)
        else:
            _cache = {}
    return _cache


def _lit(v, typ: str) -> str:
    if v is None:
        return "NULL"
    if typ == "string":
        return "'" + str(v).replace("'", "''") + "'"
    if typ == "boolean":
        return "true" if v else "false"
    if typ == "double":
        # repr round-trips the exact double; DuckDB parses back the same bits
        return repr(float(v))
    return str(int(v))


def golden_oracle(name: str) -> str | None:
    """Render the pinned VALUES oracle for ``name``; None when the golden
    file (or the op's entry) is absent — the op then registers rows-only,
    so a missing/ungenerated pin degrades gracefully, never silently
    passes."""
    spec = _load().get(name)
    if not spec:
        return None
    cols, types, rows = spec["cols"], spec["types"], spec["rows"]
    casts = ", ".join(
        f"CAST(c{i} AS {_DUCK_TYPES[t]}) AS {c}"
        for i, (c, t) in enumerate(zip(cols, types))
    )
    tuples = ", ".join(
        "(" + ", ".join(_lit(v, t) for v, t in zip(row, types)) + ")"
        for row in rows
    )
    names = ", ".join(f"c{i}" for i in range(len(cols)))
    return f"SELECT {casts} FROM (VALUES {tuples}) t({names})"
