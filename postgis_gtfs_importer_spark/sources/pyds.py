"""GTFS zip archives as a Spark Python Data Source (Spark 4, SPARK-44076).

The reference downloads a GTFS zip and shells out to extract it before
anything can read the data (/root/reference/download.sh, import.sh:38).
``sources/gtfs_feed.py`` mirrors that extract-then-scan pipeline (the
right shape for the full import: extract ONCE, read columnar many
times). This module adds the Spark-4-native alternative for ad-hoc
inspection: register the ``gtfszip`` data source and

    spark.read.format("gtfszip").option("path", p).load()

reads the archive's members DISTRIBUTED — one input partition per zip
member, each task opening the archive independently and streaming only
its member — without an extraction step or local scratch space.

Output schema: (member string, line_no long, line string) — raw lines,
feeding the same tolerant CSV parsing as extracted files.

Scale notes:
- Parallelism is member-granular: a feed's 10 .txt members fan out to
  10 tasks. DEFLATE members are not splittable (same physics as .gz),
  so ONE giant member still serializes — exactly why the import
  pipeline extracts to splittable storage first; this source documents
  that boundary instead of hiding it.
- The archive must be visible to every executor (shared FS / object
  store), the same contract as any Spark file source.
"""

from __future__ import annotations

import zipfile
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _MemberPartition(InputPartition):
    def __init__(self, path: str, member: str):
        self.path = path
        self.member = member


class GtfsZipReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("gtfszip: option 'path' is required")
        self.suffix = options.get("suffix", ".txt")

    def partitions(self) -> Sequence[InputPartition]:
        with zipfile.ZipFile(self.path) as z:
            members = [
                n
                for n in z.namelist()
                if n.endswith(self.suffix) and not n.endswith("/")
            ]
        return [_MemberPartition(self.path, m) for m in sorted(members)]

    def read(self, partition: _MemberPartition) -> Iterator[tuple]:
        with zipfile.ZipFile(partition.path) as z, z.open(
            partition.member
        ) as f:
            for i, raw in enumerate(f):
                yield (
                    partition.member,
                    i,
                    raw.decode("utf-8", "replace").rstrip("\r\n"),
                )


class GtfsZipDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gtfszip"

    def schema(self) -> str:
        return "member string, line_no long, line string"

    def reader(self, schema) -> GtfsZipReader:
        return GtfsZipReader(self.options)


def register_gtfszip(spark) -> None:
    """Idempotently register the ``gtfszip`` format on the session."""
    spark.dataSource.register(GtfsZipDataSource)
