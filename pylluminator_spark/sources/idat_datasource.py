"""Spark 4 Python DataSource for IDAT files: ``spark.read.format("idat")``.

The second of the two S1 strategies from SURVEY §2.1 (the first being
``binaryFile`` + ``mapInPandas`` in :mod:`pylluminator_spark.sources.idat`,
which shares the byte parser). A registered data source gives the scan a
first-class planner identity: one :class:`InputPartition` per file (IDATs
are ~1-8 MB, independent, never split), Arrow ``RecordBatch`` output so rows
reach the JVM columnar without per-row pickling, and the usual
``.load(path)`` UX.

Reference parity: the emitted long schema matches
/root/reference/pylluminator/read_idat.py:364-373's per-file DataFrame plus
the (sample, channel) filename-derived columns (samples.py:1770-1789).

Usage::

    from pylluminator_spark.sources.idat_datasource import IdatDataSource
    spark.dataSource.register(IdatDataSource)
    df = spark.read.format("idat").load("/data/idats/*.idat*")
"""

from __future__ import annotations

import glob as _glob
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from pylluminator_spark.sources.idat import (
    IDATA_SCHEMA,
    parse_idat_bytes,
    sample_channel_from_path,
)


class IdatFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class IdatDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("idat source requires a path: .load('<glob>')")
        self._path = path

    def partitions(self) -> Sequence[InputPartition]:
        # Driver-side listing only — file CONTENTS are read on executors.
        paths = sorted(_glob.glob(self._path))
        if not paths:
            raise FileNotFoundError(f"no IDAT files match {self._path!r}")
        return [IdatFilePartition(p) for p in paths]

    def read(self, partition: IdatFilePartition) -> Iterator:
        import pyarrow as pa

        sample, channel = sample_channel_from_path(partition.path)
        with open(partition.path, "rb") as fh:
            parsed = parse_idat_bytes(fh.read())
        n = len(parsed["illumina_id"])
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([sample] * n, pa.string()),
                pa.array([channel] * n, pa.string()),
                pa.array(parsed["illumina_id"].astype("int32"), pa.int32()),
                pa.array(parsed["mean_value"].astype("float32"), pa.float32()),
                pa.array(parsed["std_dev"].astype("float32"), pa.float32()),
                pa.array(parsed["n_beads"].astype("int32"), pa.int32()),
            ],
            names=[
                "sample", "channel", "illumina_id",
                "mean_value", "std_dev", "n_beads",
            ],
        )


class IdatDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "idat"

    def schema(self) -> str:
        return IDATA_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return IdatDataSourceReader(self.options)
