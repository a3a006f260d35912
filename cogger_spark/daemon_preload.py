"""Custom PySpark worker daemon that preloads the heavy scientific stack.

PySpark forks one worker per task from the daemon process; with the stock
daemon each fork pays the numpy/pandas/pyarrow import (~1s CPU + a syscall
storm) when it unpickles the first Arrow kernel. Importing those modules in
the daemon BEFORE forking makes every worker inherit them via copy-on-write
— measured ~2x on the Arrow-heavy tiling stage at 32 concurrent tasks.

Enabled via spark.python.daemon.module=cogger_spark.daemon_preload
(session.py); requires this package on the worker PYTHONPATH.
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import zlib  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
