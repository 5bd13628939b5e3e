"""Spark 4 Python DataSource wrapper for the dependency-free xlsx reader —
``spark.read.format("rfs_xlsx")`` as a first-class source.

The reference ingests workbooks with driver-side ``pd.read_excel``
(``jobs/ingest_xlsx_to_parquet.py:8-11``).  This engine's primary executor
path is ``sources.xlsx.read_xlsx`` (binaryFile -> mapInPandas, works against
any Hadoop-visible filesystem).  This module adds the idiomatic Spark 4
spelling of the same capability via the public Python DataSource API
(``pyspark.sql.datasource``): one input partition per workbook (a zip member
cannot be split mid-stream — the same parallelism unit as the mapInPandas
path), rows parsed on executors by the shared stdlib parser.

File listing happens driver-side with ``glob`` over a local/POSIX path —
the documented scope of this wrapper (lakehouse object stores go through
the binaryFile path, whose listing is Hadoop's).  Usage::

    spark.dataSource.register(XlsxDataSource)
    df = (spark.read.format("rfs_xlsx")
          .schema("Invoice string, Quantity long, ...")
          .option("header", "true")
          .load("/data/workbooks/*.xlsx"))
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

from .xlsx import iter_workbook_rows

__all__ = ["XlsxDataSource"]


class _WorkbookPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class XlsxDataSource(DataSource):
    """``format("rfs_xlsx")`` — schema is required (DDL via ``.schema()``);
    options: ``header`` ("true" default: first row maps declared names to
    positions per sheet), ``sheets`` (comma-separated allowlist)."""

    @classmethod
    def name(cls) -> str:
        return "rfs_xlsx"

    def schema(self):
        raise ValueError(
            "rfs_xlsx requires an explicit schema: call .schema(<DDL>) — "
            "column names map to sheet header cells, types drive cell "
            "coercion (uncoercible cells become null)"
        )

    def reader(self, schema: T.StructType) -> "XlsxReader":
        return XlsxReader(schema, self.options)


class XlsxReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._names = [f.name for f in schema.fields]
        self._dtypes = [f.dataType for f in schema.fields]
        self._header = str(options.get("header", "true")).lower() != "false"
        sheets = options.get("sheets")
        self._sheets = [s.strip() for s in sheets.split(",")] if sheets else None
        path = options.get("path")
        if not path:
            raise ValueError("rfs_xlsx requires a path: .load('/dir/or/glob')")
        # Driver-side glob is local/POSIX only: a URI-scheme path (s3a://,
        # hdfs://, ...) would silently glob to an empty DataFrame — fail
        # loudly and point at the Hadoop-listed path instead (ADVICE r4).
        if "://" in path:
            raise ValueError(
                f"rfs_xlsx lists files with local glob; {path!r} has a URI "
                "scheme — read object-store workbooks through "
                "sources.xlsx.read_xlsx (binaryFile listing is Hadoop's)"
            )
        if os.path.isdir(path):
            path = os.path.join(path, "*.xlsx")
        self._paths = sorted(glob.glob(path))

    def partitions(self):
        # one task per workbook — the honest parallelism unit for zip-packed
        # spreadsheets; an empty glob yields an empty DataFrame, not a fail
        return [_WorkbookPartition(p) for p in self._paths] or [
            _WorkbookPartition("")
        ]

    def read(self, partition: _WorkbookPartition):
        if not partition.path:
            return
        with open(partition.path, "rb") as f:
            content = f.read()
        for row, _sheet in iter_workbook_rows(
            content, self._names, self._dtypes, self._header, self._sheets
        ):
            yield tuple(row)
