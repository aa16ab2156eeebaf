"""Spark 4 Python Data Source exposing snapshot tables to the reader API:

    spark.dataSource.register(SnapshotDataSource)
    spark.read.format("snapshot_table").option("version", 2).load(path)

This is the DSv2-style integration of ``sources.snapshots.SnapshotTable``
(which readers otherwise use via ``table.read(spark)``): the manifest is
resolved ONCE at planning time into the partition list — one input
partition per committed data file, so scan parallelism is file-level and
time travel is an option, exactly how a table-format connector plugs into
an engine. Rows are served as Arrow record batches via pyarrow (the
vectorized path of the Python Data Source API), never tuple-at-a-time.

Scale notes: the plan ships only (path, file list) to executors; each
partition reads one parquet file locally. Column pruning/filter pushdown
are not wired (the stock parquet reader path via ``table.read`` keeps
those); this connector exists to make snapshot tables first-class in
``spark.read.format`` pipelines and to cover the Spark 4 custom-source
surface.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SnapshotDataSource(DataSource):
    """``format("snapshot_table")``; options: ``path`` (required),
    ``version`` (optional time travel)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def _snapshot(self):
        from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import (
            SnapshotTable,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("snapshot_table: .load(path) is required")
        table = SnapshotTable(path)
        v = self.options.get("version")
        return table, table.snapshot(int(v) if v is not None else None)

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        table, snap = self._snapshot()
        if not snap.files:
            raise ValueError(f"snapshot_table: v{snap.version} is empty")
        return from_arrow_schema(
            pq.read_schema(str(table.root / snap.files[0]))
        )

    def reader(self, schema) -> DataSourceReader:
        table, snap = self._snapshot()
        return _SnapshotReader(
            [str(table.root / f) for f in snap.files],
            [f.name for f in schema.fields],
        )


class _SnapshotReader(DataSourceReader):
    def __init__(self, files: list[str], columns: list[str]):
        self.files = files
        self.columns = columns

    def partitions(self):
        # one partition per committed data file: scan parallelism follows
        # the manifest, with no directory listing anywhere
        return [InputPartition(f) for f in self.files]

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq

        # Arrow-vectorized: yield record batches, not per-row tuples
        yield from pq.ParquetFile(partition.value).iter_batches(
            columns=self.columns
        )
