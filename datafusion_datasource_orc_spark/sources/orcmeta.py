"""`orcmeta` — a PySpark Python Data Source exposing ORC file metadata.

The reference's identity is a custom FORMAT PLUGIN registered with the
engine (`OrcFormat` implementing DataFusion's `FileFormat`,
src/file_format.rs:90-205). Spark ships the ORC *data* path natively, so
the repo's scan queries ride on it — but Spark 4's Python Data Source API
(`pyspark.sql.datasource`) is the public equivalent of that plugin seam,
and this module exercises it end to end: a registered named format whose
reader plans ONE INPUT PARTITION PER FILE, so footer reads fan out across
the cluster exactly like the reference's bounded-concurrency metadata
fetches (src/file_format.rs:146-161, `meta_fetch_concurrency`).

The table it serves is the reference's per-file metadata surface
(`read_orc_schema` + exact statistics, src/metadata.rs:35-58 and the
per-file metrics of src/metrics.rs): one row per ORC file with row count,
stripe count, column count and byte size. At 100 TB this pattern — a
metadata-only scan distributed file-per-task with NO row data moving — is
how you audit a lake's layout (file sizing, stripe health, schema drift)
without paying a data scan.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class OrcFilePartition(InputPartition):
    def __init__(self, index: int, path: str):
        self.index = index
        self.path = path


class OrcMetadataReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("orcmeta requires a path (load(<dir>) or option('path', ...))")
        self._name_filters: list = []

    def pushFilters(self, filters):
        """Pushdown NEGOTIATION at the plugin seam (the reference's
        supports_filters_pushdown, src/file_format.rs / predicate.rs:53-245
        analogue): file_name equality/prefix predicates prune PARTITIONS —
        pruned files never get a task, the footer is never opened — and
        every other filter is handed back for Spark to re-check, the exact
        accept-a-subset / fallback contract of A8/A10."""
        from pyspark.sql.datasource import EqualTo, StringStartsWith

        remaining = []
        for f in filters:
            if (
                isinstance(f, (EqualTo, StringStartsWith))
                and tuple(f.attribute) == ("file_name",)
            ):
                self._name_filters.append(f)
            else:
                remaining.append(f)
        return remaining

    def _keep(self, fname: str) -> bool:
        from pyspark.sql.datasource import EqualTo

        for f in self._name_filters:
            if isinstance(f, EqualTo):
                if fname != f.value:
                    return False
            elif not fname.startswith(f.value):  # StringStartsWith
                return False
        return True

    def partitions(self) -> Sequence[OrcFilePartition]:
        files = sorted(
            f
            for f in os.listdir(self.path)
            if not f.startswith(("_", ".")) and not f.endswith(".crc")
        )
        return [
            OrcFilePartition(i, os.path.join(self.path, f))
            for i, f in enumerate(files)
            if self._keep(f)
        ]

    def read(self, partition: OrcFilePartition) -> Iterator[tuple]:
        # import inside read(): runs on the executor, keeps the reader object
        # picklable (the documented pattern for non-serializable resources)
        import pyarrow.orc as orc

        f = orc.ORCFile(partition.path)
        yield (
            partition.index,
            os.path.basename(partition.path),
            int(f.nrows),
            int(f.nstripes),
            len(f.schema.names),
            int(os.path.getsize(partition.path)),
        )


class OrcMetaStreamReader(SimpleDataSourceStreamReader):
    """Streaming file DISCOVERY over a growing ORC directory — the ingest
    front door of an incremental pipeline (pairs with dedup_bloom_ingest:
    discover new files → probe the membership filter → admit).

    Offset = the sorted set of already-consumed file names, so
    readBetweenOffsets replays any batch deterministically after a failure
    (exactly the file-stream-source contract). A name-set offset is right
    at demo scale; at 100 TB the offset becomes a monotonic manifest/ledger
    sequence number — same read/commit protocol, constant-size offsets."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("orcmeta requires a path (load(<dir>) or option('path', ...))")

    def _list(self) -> list[str]:
        return sorted(
            f
            for f in os.listdir(self.path)
            if not f.startswith(("_", ".")) and not f.endswith(".crc")
        )

    def _rows(self, names: list[str]) -> Iterator[tuple]:
        # same 6-column row shape as the batch reader (DataSource.schema()
        # is shared); file_index is the ordinal within this (sorted, hence
        # replay-deterministic) batch of newly discovered files
        import pyarrow.orc as orc

        for i, name in enumerate(names):
            p = os.path.join(self.path, name)
            f = orc.ORCFile(p)
            yield (
                i,
                name,
                int(f.nrows),
                int(f.nstripes),
                len(f.schema.names),
                int(os.path.getsize(p)),
            )

    # unit-separator joined: a legal-but-unusual comma in a file name must
    # not corrupt the offset (re-emitting the file forever); \x1f cannot
    # appear in a path component
    _SEP = "\x1f"

    def initialOffset(self) -> dict:
        return {"seen": ""}

    @classmethod
    def _decode(cls, offset: dict) -> set[str]:
        return set(offset.get("seen", "").split(cls._SEP)) - {""}

    def read(self, start: dict):
        seen = self._decode(start)
        new = [f for f in self._list() if f not in seen]
        end = {"seen": self._SEP.join(sorted(seen | set(new)))}
        # iter over a materialized list, not a generator: the runner's
        # prefetch cache calls next() AND shallow-copies the iterator for
        # replay — list iterators support copy (via __reduce__), generators
        # don't
        return iter(list(self._rows(new))), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(list(self._rows(sorted(self._decode(end) - self._decode(start)))))


class OrcMetadataDataSource(DataSource):
    """spark.read.format("orcmeta").load(dir) → one row per ORC file;
    spark.readStream.format("orcmeta").load(dir) → one row per NEWLY
    DISCOVERED file per micro-batch (checkpointable offsets)."""

    @classmethod
    def name(cls) -> str:
        return "orcmeta"

    def schema(self) -> str:
        return (
            "file_index INT, file_name STRING, num_rows BIGINT, "
            "num_stripes INT, num_columns INT, file_bytes BIGINT"
        )

    def reader(self, schema) -> OrcMetadataReader:
        return OrcMetadataReader(self.options)

    def simpleStreamReader(self, schema) -> OrcMetaStreamReader:
        return OrcMetaStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the orcmeta format on a session.

    Also enables Python data source filter pushdown (runtime-settable
    session conf, default false): a reader that implements pushFilters()
    FAILS ANALYSIS when the conf is off, so registering the format without
    it would break on a vanilla caller session (the driver's)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OrcMetadataDataSource)
