"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: build the inverted index over the sf0.001
                 corpus (real analyzer dispatch) and run a BM25 top-10.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data-pipeline extras), each (spark, sf_dir) →
                 DataFrame.
oracle_sql()   — DuckDB-runnable ANSI SQL equivalent per query (omitted
                 for hash-function-dependent ops → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index the sf0.001 corpus, BM25 top-10 for 'data table'."""
    from watertower_spark.gate import _gate_index
    from watertower_spark.operators.search import SearchEngine

    idx = _gate_index(spark, "/root/testdata/sf0.001")
    eng = SearchEngine(spark, idx)
    return eng.search("data table", None, mode="bm25", k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from watertower_spark.gate import QUERIES

    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from watertower_spark.gate import QUERIES

    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
