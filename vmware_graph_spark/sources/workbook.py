"""RVTools workbook reader (S1): one DataFrame per sheet.

The reference's only source is ``apoc.load.xls(url, sheet,
{header:true})`` — 36 call sites across 12 sheets
(refresh-vmware.cypher:26,34,44,55,73,…) — which streams each worksheet
as header-named rows whose cells are effectively string-or-null
(SURVEY §1.2). This module is the Spark-side equivalent feeding
``ingest.refresh.refresh(spark, sheets)``:

- a *workbook directory* of ``<sheet>.parquet`` or ``<sheet>.csv``
  files (the fixture/production lakehouse path — at 100 TB the export
  lands as columnar files, never a single XLSX);
- a real ``.xlsx`` workbook via pandas/openpyxl → ``createDataFrame``,
  gated behind an import-try because the Excel codec is not in this
  container (the driver-side read is inherently single-node — an XLSX
  is a zip, not splittable — so production converts to parquet once,
  then everything downstream is distributed).

CSV sheets are read header=true with ALL columns as strings — exactly
the ``apoc.load.xls`` value model; each ingest stage applies its own
``try_cast`` (SURVEY §2.8 toInt) just as the Cypher did.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The 12 RVTools sheets the reference ingests (refresh-vmware.cypher
# sheet args; SURVEY §0).
SHEETS: tuple[str, ...] = (
    "vCluster",
    "vInfo",
    "vRP",
    "vHost",
    "vSwitch",
    "vPort",
    "vNIC",
    "vNetwork",
    "vDatastore",
    "vDisk",
    "vPartition",
    "vSnapshot",
)


def read_workbook_dir(
    spark: SparkSession, path: str, *, sheets: tuple[str, ...] = SHEETS
) -> dict[str, DataFrame]:
    """Read a workbook directory: ``<sheet>.parquet`` preferred,
    ``<sheet>.csv`` (header, all-string) otherwise. Missing sheets are
    simply absent from the result — the reference likewise just skips a
    sheet the workbook doesn't carry."""
    out: dict[str, DataFrame] = {}
    for sheet in sheets:
        pq = os.path.join(path, f"{sheet}.parquet")
        csv = os.path.join(path, f"{sheet}.csv")
        if os.path.exists(pq):
            out[sheet] = spark.read.parquet(pq)
        elif os.path.exists(csv):
            out[sheet] = spark.read.option("header", True).csv(csv)
    return out


def read_workbook_xlsx(
    spark: SparkSession, path: str, *, sheets: tuple[str, ...] = SHEETS
) -> dict[str, DataFrame]:
    """Read a real RVTools ``.xlsx`` via pandas → createDataFrame.

    STUB-GATED: raises NotImplementedError when no Excel engine
    (openpyxl) is installed — marking exactly where a real deployment
    plugs in. All values arrive as strings (``dtype=str``), matching
    the apoc.load.xls value model."""
    try:
        import pandas as pd

        pd.io.excel.ExcelFile  # probe the API surface
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "XLSX reading needs openpyxl; convert the workbook to parquet/csv "
            "and use read_workbook_dir instead"
        ) from e
    import pandas as pd

    out: dict[str, DataFrame] = {}
    with pd.ExcelFile(path) as xf:
        for sheet in sheets:
            if sheet in xf.sheet_names:
                pdf = xf.parse(sheet, dtype=str)
                out[sheet] = spark.createDataFrame(pdf)
    return out
