"""Local mirror of the driver's correctness gate: run every registry op in
Spark AND its DuckDB oracle at sf0.01, compare row-count + column names +
order-insensitive values.  Usage:

    python scripts/check_oracles.py [op ...]   # default: all ops
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


_DTYPE_CLASS = {
    # hash-equivalence classes for pandas dtypes: within a class the typed
    # hash agrees; across int<->float it does not (the r02 failure mode)
    "int8": "int", "int16": "int", "int32": "int", "int64": "int",
    "uint8": "int", "uint16": "int", "uint32": "int", "uint64": "int",
    "Int64": "int",
    "float16": "float", "float32": "float", "float64": "float",
    # timestamp resolution differs benignly between exporters
    "datetime64[ns]": "ts", "datetime64[us]": "ts", "datetime64[ms]": "ts",
}


def _dtype_mismatch(spdf, dpdf):
    bad = []
    for c in spdf.columns:
        if c not in dpdf.columns:
            continue
        a = str(spdf[c].dtype)
        b = str(dpdf[c].dtype)
        ca = _DTYPE_CLASS.get(a, a)
        cb = _DTYPE_CLASS.get(b, b)
        if ca != cb and "object" not in (ca, cb):
            bad.append(f"{c}: spark={a} oracle={b}")
    return "; ".join(bad)


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: nullable columns make raw tuples unorderable (None < int)
    out = sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=repr)
    return out


def main(argv):
    import duckdb

    from engine.ops import REGISTRY, _load_all
    from engine.session import get_spark

    _load_all()
    names = argv or sorted(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown op(s): {unknown}; known: {sorted(REGISTRY)}")
        return 2
    spark = get_spark(
        master="local[8]",
        app_name="oracle-check",
        shuffle_partitions=8,
        extra={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(
                f"rows  {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s) [rows-only]"
            )
            n_rows_only += 1
            continue
        try:
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            ms, md = multiset(s_rows, s_cols), multiset(d_rows, d_cols)
            if ms != md:
                diff = [
                    (a, b) for a, b in zip(ms, md) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if not problems:
            # Driver-faithful typed stage: the driver exports both sides to
            # pandas, sorts columns by name, and hashes TYPED values — an
            # int64-vs-float64 dtype split (e.g. DuckDB HUGEINT export) fails
            # there even when the Python-normalized values above are equal.
            # Reproduce that sensitivity so dtype artifacts surface locally.
            try:
                spdf = sdf.toPandas()
                dpdf = con.execute(spec.oracle).df()
                dt = _dtype_mismatch(spdf, dpdf)
                if dt:
                    problems.append(f"typed-dtype mismatch: {dt}")
            except Exception as e:  # pragma: no cover - diagnostics only
                problems.append(f"typed-compare error: {e}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(
        f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAIL "
        f"of {len(names)}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
