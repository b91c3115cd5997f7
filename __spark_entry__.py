"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship tiered-rollup envelope on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data pipeline ops, with DuckDB oracles for all
SQL-expressible semantics (non-expressible kernels — IIR filters, FFT,
Gorilla, LSH-ANN — are rows-only by design).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable however the driver loaded this file (its cwd
# may not be the repo root)
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from ezmsg_sigproc_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-user 1-minute envelope
    rollup (count/sum/min/max/mean) — the BinnedAggregate (MIN,MAX) chain."""
    return entry_queries.rollup_1m_envelope(spark, "/root/testdata/sf0.001")


def _with_session_tuning(fn: Callable) -> Callable:
    """The driver builds its own SparkSession; apply the runtime-settable
    bits of our session tuning (session.py) before each query — most
    importantly the AQE coalesce floor, without which tiny pandas-UDF
    shuffles collapse to ONE task and every grouped kernel runs serially
    (correctness unaffected; wall time 5×). Safe no-ops when already set."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
            spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        except Exception:
            pass  # conf locked down — purely a performance hint
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_session_tuning(fn) for name, fn in entry_queries.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.ORACLES)
