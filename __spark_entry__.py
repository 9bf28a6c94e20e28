"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator registry in
``vmware_graph_spark.queries`` (one entry per SURVEY.md §2 operator /
LLM-pipeline extension, each with a DuckDB oracle twin unless the op is
genuinely non-SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: dedup + text-quality rollup over sf0.001 documents.

    Exercises the engine's own kernels (exact_dedup fingerprint pass,
    language-ID, token stats) end-to-end and returns a small stable
    (lang_pred, n_docs, avg_tokens) DataFrame.
    """
    from vmware_graph_spark.functions.text import lang_id, n_tokens
    from vmware_graph_spark.operators.dedup import exact_dedup
    from vmware_graph_spark.session import tune
    from vmware_graph_spark.sources.tables import load_table

    tune(spark)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    deduped = exact_dedup(docs, "doc_id", "text")
    return (
        deduped.select(lang_id("text").alias("lang_pred"), n_tokens("text").alias("n_tok"))
        .groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        )
    )


# The registry is exposed in a DETERMINISTIC PER-ROUND ROTATION of its
# registration order (round-8 VERDICT #5): the driver's correctness
# gate samples a prefix of this dict, and a fixed order meant eight
# rounds of CORRECTNESS_r*.json hash-checked the SAME first-50 queries
# while ~300 later registrations were only covered in-tree. Sorting by
# md5(name || round) keeps the exposure UNCURATED (no human picks the
# sample; the hash has no knowledge of which queries are easy) while
# walking the whole registry across rounds. The round number is read
# off the committed CORRECTNESS_r*.json artifacts — deterministic at
# driver run time, no clock involved. Breadth certification across
# EVERY family remains a separate, documented suite:
# `python tools/selfcheck.py` runs the FULL registry (row + schema +
# value compare vs DuckDB at sf0.01), and `tools/breadth_suite.py`
# lists one representative per operator family for a quick spanning
# check.


def _round_number() -> int:
    import glob
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    return len(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))) + 1


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import hashlib

    from vmware_graph_spark.queries import QUERIES
    from vmware_graph_spark.session import tune

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        return run

    rnd = _round_number()
    order = sorted(
        QUERIES, key=lambda n: hashlib.md5(f"{n}|{rnd}".encode()).hexdigest()
    )
    return {name: wrap(QUERIES[name]) for name in order}


def oracle_sql() -> dict[str, str]:
    from vmware_graph_spark.queries import ORACLE

    return dict(ORACLE)
