"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship BM25 top-k over the sf0.001 documents table.
- ``queries()``: one callable per implemented operator (SURVEY.md §2 +
  training-data pipeline ops) — see sparksearch/contract.py.
- ``oracle_sql()``: equivalent DuckDB SQL per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from sparksearch import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All contract queries, auto-rotated: entries whose latest driver
    check (committed CORRECTNESS_r*.json) is oldest come first, so the
    driver's 50-entry window re-verifies the stalest entries each round
    without hand-maintained ordering."""
    return contract.rotated_queries()


def oracle_sql() -> dict[str, str]:
    oracles = contract.oracle_sql()
    # same rotation order as queries() (cosmetic — drivers key by name)
    return {n: oracles[n] for n in contract.rotated_queries() if n in oracles}
