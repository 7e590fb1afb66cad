"""Python-worker daemon wrapper: mtime-aware zipimport invalidation.

Every Python-UDF task makes the worker run ``setup_spark_files`` →
``importlib.invalidate_caches()``; on CPython 3.11 each
``zipimport.zipimporter.invalidate_caches()`` call unconditionally
re-reads its archive's ENTIRE central directory, and a worker whose
``sys.path`` carries pyspark.zip/py4j.zip re-parses them on every task
— profiled at ~200 ms of pure worker CPU per task on this install
(cProfile via this wrapper: 4.1 s of 5.0 s across 6 tasks inside
``zipimport._read_directory``), which is exactly the run≫cpu,
gc=0 stall every Arrow/pandas-UDF stage showed. Later CPythons fix
this upstream by checking the archive's mtime before re-reading
(the check below mirrors that); a changed or replaced zip still
invalidates, an untouched one is a stat() no-op.

Activated by ``spark.python.daemon.module=kdi_pydaemon`` (set by
``session.get_spark`` only when IT creates the local context and this
file is importable); the stock ``pyspark.daemon`` manager loop runs
unchanged after the patch, and any failure to patch falls through to
stock behavior.
"""

import os
import zipimport


def _install() -> None:
    try:
        orig = zipimport.zipimporter.invalidate_caches
        seen: dict = {}

        def invalidate_caches(self):
            try:
                archive = self.archive
                st = os.stat(archive)
                key = (st.st_mtime_ns, st.st_size)
                if seen.get(archive) == key:
                    return None
                seen[archive] = key
            except OSError:
                pass
            return orig(self)

        zipimport.zipimporter.invalidate_caches = invalidate_caches
    except Exception:
        pass


_install()

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
