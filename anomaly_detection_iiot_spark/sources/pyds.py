"""Spark 4 Python DataSource for the bearing snapshot directory —
the reference's on-disk layout (one headerless TSV per snapshot,
timestamp in the filename; reference src/utils/files.py) exposed as a
first-class pluggable source:

    spark.dataSource.register(BearingSnapshotDataSource)
    spark.read.format("bearing_snapshots")
         .option("path", dir).option("n_cols", 4).load()

Why a custom source when sources/bearing.py already reads this layout
through the CSV scanner: the DataSource API puts the layout's
SEMANTICS (filename event-time, per-file sample index, positional
channels) inside the source itself —

- **one partition per snapshot file** (`partitions()`), so parallelism
  is the file count and sample_idx needs NO window function: each
  reader enumerates its own file locally, where the CSV path must
  reconstruct row order with a per-file window (a shuffle);
- filename→event-time parsing happens AT the source; malformed names
  fail the one file, not the scan;
- Arrow-friendly batch emission: rows yielded as tuples, converted by
  the engine.

Parity with the CSV path is pinned by tests/test_pyds.py (exact row
equality against read_snapshot_dir). The scale story is identical to
any file source: partition = file, no shuffle, column pruning via the
projected schema.
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

_TS_RE = re.compile(r"(\d{4})\.(\d{2})\.(\d{2})\.(\d{2})\.(\d{2})\.(\d{2})")


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class BearingSnapshotReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options["path"]
        self.n_cols = int(options.get("n_cols", 4))
        positions = options.get("channel_positions")
        self.positions = (
            [int(p) for p in positions.split(",")]
            if positions
            else list(range(self.n_cols))
        )

    def partitions(self):
        files = sorted(
            f
            for f in os.listdir(self.dir)
            if not f.startswith(".") and _TS_RE.search(f)
        )
        return [_FilePartition(os.path.join(self.dir, f)) for f in files]

    def read(self, partition):
        from datetime import datetime

        name = os.path.basename(partition.path)
        m = _TS_RE.search(name)
        ts = datetime(*[int(g) for g in m.groups()])
        with open(partition.path) as fh:
            for idx, line in enumerate(fh):
                if not line.strip():
                    continue
                cells = line.rstrip("\n").split("\t")
                yield tuple(
                    [float(cells[p]) for p in self.positions] + [ts, idx]
                )


class BearingSnapshotDataSource(DataSource):
    """format name: ``bearing_snapshots``"""

    @classmethod
    def name(cls):
        return "bearing_snapshots"

    def schema(self):
        n_cols = int(self.options.get("n_cols", 4))
        positions = self.options.get("channel_positions")
        n_out = len(positions.split(",")) if positions else n_cols
        return StructType(
            [
                StructField(f"vibration_{i}", DoubleType())
                for i in range(n_out)
            ]
            + [
                StructField("file_ts", TimestampType()),
                StructField("sample_idx", IntegerType()),
            ]
        )

    def reader(self, schema):
        return BearingSnapshotReader(self.options)

    def simpleStreamReader(self, schema):
        return BearingSnapshotStreamReader(self.options)


class BearingSnapshotStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the plugin: the snapshot DIRECTORY is the
    log and the lexicographically-sorted FILENAME is the offset (the
    reference's timestamp stamps sort chronologically by
    construction, so filename order is arrival order). Offsets are
    the JSON dict ``{"upto": "<last filename consumed>"}``:

    - ``read(start)`` consumes every file strictly after
      ``start["upto"]`` and advances the offset to the last one — a
      micro-batch is an immutable file range;
    - ``readBetweenOffsets(start, end)`` replays exactly that range
      after a failure, which is what makes the source's micro-batches
      deterministic under recovery (the engine persists the offsets
      in the checkpoint, same contract as the built-in file source).
    """

    def __init__(self, options):
        self.dir = options["path"]
        self._batch = BearingSnapshotReader(options)

    def _files_after(self, upto: str, end: str | None = None):
        names = sorted(
            f
            for f in os.listdir(self.dir)
            if not f.startswith(".") and _TS_RE.search(f)
        )
        return [
            n for n in names if n > upto and (end is None or n <= end)
        ]

    def initialOffset(self):
        return {"upto": ""}

    def read(self, start: dict):
        names = self._files_after(start["upto"])
        end = {"upto": names[-1]} if names else dict(start)
        # iterator over a materialized list (not a generator): the
        # engine PICKLES the prefetched rows so an un-checkpointed
        # batch can be replayed, and list iterators pickle cleanly
        return iter(self._rows(names)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            self._rows(self._files_after(start["upto"], end["upto"]))
        )

    def _rows(self, names):
        out = []
        for n in names:
            out.extend(
                self._batch.read(_FilePartition(os.path.join(self.dir, n)))
            )
        return out
