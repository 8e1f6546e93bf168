"""engine/fastdaemon.py gate semantics: the per-task import-cache flush
fires exactly when the py-files path set (or a zip's bytes) changes —
addPyFile still invalidates, the steady state pays nothing."""

from __future__ import annotations

import importlib
import sys
import zipfile

import engine.fastdaemon as fd


def _reset():
    fd._last_sig = None


def test_steady_state_flushes_once(monkeypatch):
    _reset()
    calls = []
    monkeypatch.setattr(importlib, "invalidate_caches", lambda: calls.append(1))
    fd._conditional_invalidate()  # first task: unseen signature → flush
    fd._conditional_invalidate()  # steady state → no flush
    fd._conditional_invalidate()
    assert len(calls) == 1


def test_new_path_entry_flushes(monkeypatch, tmp_path):
    _reset()
    calls = []
    monkeypatch.setattr(importlib, "invalidate_caches", lambda: calls.append(1))
    fd._conditional_invalidate()
    # addPyFile adds a path entry (plain insert — pytest's syspath_prepend
    # would itself call the patched invalidate_caches and skew the count)
    sys.path.insert(0, str(tmp_path))
    try:
        fd._conditional_invalidate()
    finally:
        sys.path.remove(str(tmp_path))
    assert len(calls) == 2


def test_zip_rewrite_in_place_flushes(monkeypatch, tmp_path):
    _reset()
    zp = tmp_path / "inc.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("m.py", "x = 1")
    monkeypatch.syspath_prepend(str(zp))
    calls = []
    monkeypatch.setattr(importlib, "invalidate_caches", lambda: calls.append(1))
    fd._conditional_invalidate()
    # same path, new bytes (size changes) → signature changes → flush
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("m.py", "x = 2  # longer module body than before")
    fd._conditional_invalidate()
    assert len(calls) == 2


def test_worker_util_binding_is_patched():
    # the function pyspark's worker calls per task must resolve to the gate
    import pyspark.worker_util as wu

    assert wu.importlib.invalidate_caches is fd._conditional_invalidate


def test_proxy_passes_through_other_attrs():
    import pyspark.worker_util as wu

    assert wu.importlib.import_module is importlib.import_module
    assert wu.importlib.util is importlib.util


def test_signature_tracks_plain_dirs_by_name_only(tmp_path):
    # plain dirs use CPython's mtime-aware FileFinder invalidation already;
    # the signature includes them by name so reordering/adding is caught
    # without stat costs on every task
    sig1 = fd._path_signature()
    sys.path.insert(0, str(tmp_path))
    try:
        sig2 = fd._path_signature()
    finally:
        sys.path.remove(str(tmp_path))
    assert sig1 != sig2
    assert str(tmp_path) in [e if isinstance(e, str) else e[0] for e in sig2]


def test_missing_zip_on_path_is_tolerated():
    _reset()
    ghost = "/nonexistent/ghost.zip"
    sys.path.insert(0, ghost)
    try:
        sig = fd._path_signature()  # must not raise
    finally:
        sys.path.remove(ghost)
    assert (ghost, -1, -1) in sig


def teardown_module(module):
    # leave the module's cache unset so later Spark tests in the same
    # process start from normal gating behavior
    _reset()
