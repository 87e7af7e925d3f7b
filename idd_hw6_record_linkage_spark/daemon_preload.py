"""Python worker daemon with the heavyweight scientific stack imported
BEFORE the fork loop (guide §4.5 — heavyweight init once, amortized).

``pyspark.daemon`` forks one worker per concurrent task; each forked
worker that first touches a pandas UDF then pays the numpy + pandas +
pyarrow import chain (~0.4 s serial, and the 32 simultaneous first
tasks of an Arrow stage contend on it — measured ~4 s of wall added to
the first Arrow-UDF query of a session at local[32]). Importing the
stack in the daemon parent makes every forked worker inherit the
already-initialized modules through copy-on-write memory: first-task
import cost drops to zero and the pages are shared.

Wired in session.py via ``spark.python.daemon.module`` (the documented
PythonWorkerFactory hook); the package directory is already on every
worker's PYTHONPATH (session.py exports it for pandas-UDF closures).
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
