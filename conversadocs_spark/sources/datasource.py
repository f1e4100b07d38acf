"""The multi-format document loader as a FIRST-CLASS Spark data
source (Spark 4 Python DataSource API): after registration,

    spark.read.format("docscan").load(directory)

returns (source, page, text) rows — the reference's R1/R2 directory
ingest (/root/reference/conversadocs/bones.py:33-62) exposed the way
a Spark user expects to consume any source, instead of calling a
helper function. The parse kernels are byte-identical to the
mapInPandas path (sources/ingest.py::_parse_batch — pinned by a
row-parity test), so this module is purely the integration surface:

- ``partitions()`` lists files once on the driver (the same role as
  binaryFile's file index) and groups them round-robin into
  ``numPartitions`` splits, so parsing is partition-parallel across
  executors and adding files scales the partition count, not task
  size.
- ``read(partition)`` opens only its own files — no content bytes
  ever route through the driver.
- unknown extensions are dropped at listing time (R2), before any
  bytes are read.

doc_id is deliberately NOT produced here: the stable id is
``xxhash64(source, page)`` — a JVM expression — so the wrapper
``scan_documents_ds`` adds it post-load with exactly the expression
scan_documents uses, keeping ids identical across both ingest paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from conversadocs_spark.serde import pickle_module_by_value
from conversadocs_spark.sources.ingest import (
    EXTENSIONS,
    _parse_batch,
)


class _FilesPartition(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class DocScanReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.num_partitions = int(options.get("numPartitions", "8"))

    def partitions(self):
        files: list[str] = []
        for root, _dirs, names in os.walk(self.path):
            for name in sorted(names):
                ext = os.path.splitext(name)[1].lower()
                if ext in EXTENSIONS:  # R2: filter before reading
                    files.append(os.path.join(root, name))
        files.sort()
        n = max(1, min(self.num_partitions, len(files) or 1))
        return [_FilesPartition(files[i::n]) for i in range(n)]

    def read(self, partition):
        # _parse_batch is captured at MODULE level: the data-source
        # class ships to Python workers by value (serde registration
        # below), and a kernel-internal `from conversadocs_spark...`
        # import would die on workers that can't import the package —
        # the exact executor-pickling hazard serde.py documents.
        import pandas as pd

        rows = []
        for path in partition.files:
            with open(path, "rb") as fh:
                rows.append({"path": path, "content": fh.read()})
        if not rows:
            return
        parsed = _parse_batch(pd.DataFrame(rows))
        for rec in parsed.itertuples(index=False):
            page = None if pd.isna(rec.page) else int(rec.page)
            # binaryFile reports file: URIs; emit the same form so
            # source strings — and the doc_ids hashed from them —
            # are identical across both ingest paths
            yield ("file:" + rec.source, page, rec.text)


class DocScanDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "docscan"

    def schema(self) -> str:
        return "source string, page int, text string"

    def reader(self, schema) -> DocScanReader:
        return DocScanReader(self.options)


def register_docscan(spark: SparkSession) -> None:
    """Idempotent registration of the docscan format."""
    spark.dataSource.register(DocScanDataSource)


def scan_documents_ds(spark: SparkSession, path: str) -> DataFrame:
    """scan_documents through the registered data source: identical
    rows AND identical doc_ids (same xxhash64 expression)."""
    register_docscan(spark)
    parsed = spark.read.format("docscan").load(path)
    return parsed.select(
        F.xxhash64("source", F.coalesce("page", F.lit(-1))).alias(
            "doc_id"
        ),
        "text",
        "source",
        "page",
    )


pickle_module_by_value(__name__)
