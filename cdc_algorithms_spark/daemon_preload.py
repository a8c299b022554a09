"""Python worker daemon with heavyweight imports preloaded.

``pyspark.daemon`` forks one child per worker; a forked child inherits
the parent's imported modules copy-on-write. Stock daemons import only
pyspark, so EVERY fresh worker pays the pandas + pyarrow(+compute) +
numpy import chain (~0.3-0.5 s CPU measured via the UDF perf profiler:
``marshal.loads`` / ``_imp.exec_dynamic`` / ``pyarrow.compute.
_make_global_functions`` dominate) before its first batch. A 32-core
local session that fans a stage out to 32 fresh workers burns ~10-16 s
of process CPU on imports alone — guide §4.5 (initialise heavyweight
state once) applied at the daemon level, where it amortises across
every worker instead of once per worker.

The chunker kernel modules are preloaded too (numpy is their only heavy
dependency; the compiled .so probe is per-process and cheap). Failures
are swallowed: a missing optional module must never take down worker
creation — the fork just pays that import lazily as before.
"""

from __future__ import annotations

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyarrow.compute",
    "pyspark.sql.pandas.serializers",
    "pyspark.sql.pandas.types",
):
    try:  # noqa: SIM105
        __import__(_mod)
    except Exception:  # pragma: no cover - optional dependency missing
        pass

# ---------------------------------------------------------------------------
# Freeze zipimport cache invalidation. pyspark.worker_util.
# setup_spark_files calls importlib.invalidate_caches() ON EVERY TASK;
# for every ZIP on sys.path (pyspark.zip is 3.5 MB, plus py4j) the
# zipimporter then re-reads the archive's whole central directory —
# measured ~230 ms of worker CPU per task (profile: zipimport.
# _read_directory + _unpack_uint16/32 dominate), ~8 s of pure overhead
# for one 32-task stage. The zips are part of the immutable Spark
# install, so re-reading them can never observe a change; directory
# (FileFinder) invalidation — the part addPyFile-style dynamic code
# shipping relies on — is left untouched.
# ---------------------------------------------------------------------------
try:
    import os
    import sys
    import zipimport

    _orig_invalidate = zipimport.zipimporter.invalidate_caches

    def _invalidate_unless_spark_install(self):  # type: ignore[no-untyped-def]
        """Skip invalidation ONLY for the immutable Spark-install
        archives (pyspark.zip, py4j-*.zip): those can never change
        under a running application, so re-reading their central
        directory per task is pure waste. Any OTHER zip — e.g. one
        shipped via ``sc.addPyFile``/``--py-files`` that an application
        could legitimately re-ship mid-run — falls through to the
        original method, so dynamic code shipping keeps its stock
        invalidation semantics."""
        base = os.path.basename(getattr(self, "archive", "") or "")
        if base == "pyspark.zip" or (
            base.startswith("py4j-") and base.endswith(".zip")
        ):
            return
        _orig_invalidate(self)

    zipimport.zipimporter.invalidate_caches = (  # type: ignore[method-assign]
        _invalidate_unless_spark_install
    )
    # drop sys.path zip entries that do not exist (a stale
    # lib/python311.zip ships in this interpreter's default path):
    # every per-task invalidate/stat cycle probes them for nothing
    sys.path[:] = [
        p
        for p in sys.path
        if not (p.endswith(".zip") and not os.path.exists(p))
    ]
except Exception:  # pragma: no cover - zipimport internals moved
    pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
