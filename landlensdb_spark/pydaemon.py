"""Python-worker daemon shim: per-task overhead fixes (guide §4 — the Python
boundary is paid per TASK, not only per row).

Launched by the JVM instead of ``pyspark.daemon`` via the public
``spark.python.daemon.module`` conf (set in :mod:`landlensdb_spark.session`).
It delegates everything to the stock daemon; the only changes are two
measured per-task fixed costs in the worker loop:

1. ``pyspark.worker_util.setup_spark_files`` ends with
   ``importlib.invalidate_caches()`` on EVERY task. With zipimporters on
   ``sys.path`` (pyspark.zip + py4j zip — always present on workers) each
   call re-reads and re-parses both zip directories: measured 63–80 ms per
   task on this host (see BENCH/PROFILE.md r08), i.e. more than the entire
   Arrow transfer of a 19k-row batch. The invalidation only matters when a
   NEW py-file include appeared since the last task (``add_path`` mutates
   ``sys.path`` exactly then), so the shim replaces
   ``importlib.invalidate_caches`` with a twin that calls the real one only
   when ``sys.path`` changed since the previous call. A genuinely new
   include still invalidates (add_path inserts a new entry -> snapshot
   differs); re-adding the SAME filename mid-session (which Spark's
   file-overwrite rules reject by default) is the one case the twin would
   miss, documented here as the trade.

2. The daemon's reuse loop runs ``gc.collect()`` after every task — a full
   sweep of every module-level object pyspark/numpy/pandas/pyarrow created
   at import time (~12 ms/task measured, and growing with heap).
   ``gc.freeze()`` after the daemon finishes importing moves those
   (immortal anyway) objects to the permanent generation, so the per-task
   collection only walks objects the task itself allocated. Forked workers
   inherit the frozen generation. This is the documented CPython idiom for
   pre-fork servers (gc.freeze was added for exactly this pattern).

Both changes are behavior-preserving for the engine's workloads; set
``SPARK_GRAFT_NO_DAEMON_SHIM=1`` (or unset the conf) to fall back to the
stock daemon.
"""

from __future__ import annotations

import gc
import importlib
import sys

_real_invalidate_caches = importlib.invalidate_caches
_last_sys_path: tuple | None = None


def _invalidate_caches_if_path_changed() -> None:
    """importlib.invalidate_caches twin: only pay the (zip-TOC re-parse)
    cost when a new path entry appeared — the only per-task trigger is
    worker_util.add_path inserting a new py-file include."""
    global _last_sys_path
    snapshot = tuple(sys.path)
    if snapshot != _last_sys_path:
        _last_sys_path = snapshot
        _real_invalidate_caches()


importlib.invalidate_caches = _invalidate_caches_if_path_changed

# Import the stock daemon AFTER the patch so the worker loop (and the
# pyspark.worker module it pre-imports) see the shimmed function, then
# freeze the import-time object graph so the per-task gc.collect() in the
# daemon's reuse loop no longer sweeps it.
from pyspark.daemon import manager  # noqa: E402

gc.freeze()


if __name__ == "__main__":
    manager()
