"""pyspark.daemon wrapper: skip redundant per-task import-cache flushes.

The measured wide-parallelism tax (BENCH/scaling_4to16.json, round-2
cpu_python 223 vs 98.5 core-sec for byte-identical work at 16 vs 4
cores): Spark's Python worker calls ``importlib.invalidate_caches()``
for EVERY task (pyspark/worker_util.py ``setup_spark_files``), and
CPython implements that for zip imports by re-reading the central
directory of every ``.zip`` on ``sys.path`` (``zipimport
_read_directory``).  With pyspark.zip + py4j + an engine.zip shipped
via ``--py-files`` that is ~0.25-0.7 s of CPU **per task** — profiled
at 99.7% of a trivial pandas-UDF task's worker time — so a 48-partition
UDF stage burns ~12-35 core-seconds of pure overhead, linear in
partition count.  That cost is what the invalidation is FOR only when
the py-files set changes mid-job (``sc.addPyFile``); in the steady
state the path set is identical task after task and the flush does
nothing but re-read zip directories.

This module is wired in via the documented ``spark.python.daemon.module``
conf (engine/session.py).  It patches ``pyspark.worker_util``'s view of
``importlib`` so its ``invalidate_caches()`` becomes conditional on a
signature of ``sys.path`` plus the (size, mtime) of every zip/egg on it:

- first task in a fresh worker → signature unseen → real invalidation;
- ``addPyFile`` adds a path entry (or replaces a zip in place, changing
  its stat) → signature changes → real invalidation;
- steady state → signature unchanged → no flush, ~0 cost.

Only ``worker_util``'s module-global binding is patched; ``importlib``
itself is untouched for user code.  On a multi-executor cluster the
daemon process must be able to import this module BEFORE py-files are
set up, so ship the package on the executor python path, e.g.
``--conf spark.executorEnv.PYTHONPATH=engine.zip`` alongside
``--py-files engine.zip`` (the zip lands in the executor working
directory, so the relative path resolves).  engine/session.py arranges
the local-mode equivalent automatically.
"""

from __future__ import annotations

import importlib
import os
import sys

import pyspark.worker_util as _wu

_last_sig: tuple | None = None


def _path_signature() -> tuple:
    sig = []
    for p in sys.path:
        if p.endswith((".zip", ".egg")):
            try:
                st = os.stat(p)
                sig.append((p, st.st_size, int(st.st_mtime)))
            except OSError:
                sig.append((p, -1, -1))
        else:
            sig.append(p)
    return tuple(sig)


def _conditional_invalidate() -> None:
    global _last_sig
    sig = _path_signature()
    if sig != _last_sig:
        importlib.invalidate_caches()
        _last_sig = sig


class _ImportlibView:
    """Proxy handed to pyspark.worker_util in place of ``importlib``:
    identical except invalidate_caches() is signature-gated."""

    invalidate_caches = staticmethod(_conditional_invalidate)

    def __getattr__(self, name):
        return getattr(importlib, name)


_wu.importlib = _ImportlibView()

# The daemon resolves its worker entry point at import time; import it
# AFTER the patch so every forked worker inherits the gated flush.
import pyspark.daemon as _daemon  # noqa: E402

if __name__ == "__main__":
    _daemon.manager()
