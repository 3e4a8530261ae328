"""Custom connector: the "astro_layout" Python DataSource.

Reference parity — this module is the engine's explicit restatement of the
reference's connector architecture (SURVEY.md §2.A/§4.2, upstream
``HBaseRelation`` / ``HBaseSQLTableScan`` / ``ScanPredClassifier`` /
``HBaseCriticalPoint``, unverified — reference snapshot empty):

- **Region-aligned layout** → ``ensure_range_layout()`` writes a table as N
  range-partitioned, key-sorted parquet files (N "regions" with known
  [min,max] key bounds in the footer stats).
- **Scan with partition planning** → ``partitions()`` returns one input
  partition per (file, row-group) — the unit of parallelism, like one scan
  per HBase region.
- **Predicate classification + pushdown** → ``pushFilters()`` splits
  Spark's filters into source-handled vs residual (Astro's
  ScanPredClassifier), translating the handled ones to pyarrow compute
  expressions (Astro's HBase Filter trees).
- **Critical-point range pruning** → ``partitions()`` evaluates the pushed
  predicates against per-row-group min/max footer statistics and drops
  row groups that cannot match (Astro's rowkey-range region pruning).

Everything Spark-side stays declarative: the DataFrame plan over this source
gets Catalyst's column pruning and the pushed filters are *also* applied
exactly inside ``read()`` (row-group stats only skip work; they never decide
correctness).

Scale notes (100 TB): partition granularity is the parquet row group
(~128 MB), so a 100 TB table yields ~800k independent scan tasks; pruning is
metadata-only (footer reads, no data IO) and happens at plan time on the
driver, exactly like region pruning. The Python worker decodes only the
row groups it owns and streams Arrow batches to the JVM.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from backup_repo_spark.registry import query
from backup_repo_spark.session import load_table

FORMAT_NAME = "astro_layout"


def _list_parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _target_arrow_schema(schema):
    """Arrow file schema → the schema we emit to Spark: timestamps normalized
    to microseconds (Spark's native resolution)."""
    import pyarrow as pa

    fields = []
    for f in schema:
        t = f.type
        if pa.types.is_timestamp(t):
            t = pa.timestamp("us", tz=t.tz)
        fields.append(pa.field(f.name, t, f.nullable))
    return pa.schema(fields)


@dataclass
class RowGroupPartition(InputPartition):
    """One scan task = one parquet row group of one file (the 'region')."""

    path: str
    row_group: int


class AstroLayoutReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("astro_layout requires .option('path', <dir-or-file>)")
        self._files = _list_parquet_files(path)
        if not self._files:
            raise ValueError(f"astro_layout: no parquet files under {path}")
        self._pushed: list[Filter] = []

    # -- predicate classification (ScanPredClassifier analog) ---------------
    _RANGE_TYPES = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In)
    _SUPPORTED = _RANGE_TYPES + (IsNotNull, StringStartsWith)

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, self._SUPPORTED) and len(f.attribute) == 1:
                self._pushed.append(f)
            else:
                yield f  # residual: Spark evaluates it above the scan

    # -- partition planning with stats pruning (critical-point analog) ------
    def partitions(self) -> list[RowGroupPartition]:
        import pyarrow.parquet as pq

        parts: list[RowGroupPartition] = []
        for path in self._files:
            md = pq.ParquetFile(path).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                stats = {}
                for name, ci in names.items():
                    s = md.row_group(rg).column(ci).statistics
                    if s is not None and s.has_min_max:
                        stats[name] = (s.min, s.max)
                if all(self._rg_may_match(f, stats) for f in self._pushed):
                    parts.append(RowGroupPartition(path, rg))
        # Every row group pruned → still need ≥1 partition for an empty scan.
        return parts or [RowGroupPartition(self._files[0], -1)]

    @staticmethod
    def _rg_may_match(f: Filter, stats: dict) -> bool:
        """Interval evaluation of one pushed predicate against [min,max]
        footer stats. Conservative: unknown stats or types → True."""
        col = f.attribute[0]
        if col not in stats:
            return True
        lo, hi = stats[col]
        try:
            if isinstance(f, EqualTo):
                return lo <= f.value <= hi
            if isinstance(f, GreaterThan):
                return hi > f.value
            if isinstance(f, GreaterThanOrEqual):
                return hi >= f.value
            if isinstance(f, LessThan):
                return lo < f.value
            if isinstance(f, LessThanOrEqual):
                return lo <= f.value
            if isinstance(f, In):
                return any(lo <= v <= hi for v in f.value)
        except TypeError:
            return True
        return True

    # -- scan execution ------------------------------------------------------
    def read(self, partition: RowGroupPartition):
        import pyarrow.dataset as ds
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        target = _target_arrow_schema(pf.schema_arrow)
        if partition.row_group < 0:
            yield from target.empty_table().to_batches()
            return
        table = pf.read_row_group(partition.row_group)
        expr = self._arrow_filter_expr(ds)
        if expr is not None:
            table = table.filter(expr)
        yield from table.cast(target).to_batches()

    def _arrow_filter_expr(self, ds):
        """Pushed filters → one ANDed pyarrow compute expression (the exact
        evaluation; stats pruning above is only an accelerator)."""
        import pyarrow.compute as pc

        expr = None
        for f in self._pushed:
            field = ds.field(f.attribute[0])
            if isinstance(f, EqualTo):
                e = field == f.value
            elif isinstance(f, GreaterThan):
                e = field > f.value
            elif isinstance(f, GreaterThanOrEqual):
                e = field >= f.value
            elif isinstance(f, LessThan):
                e = field < f.value
            elif isinstance(f, LessThanOrEqual):
                e = field <= f.value
            elif isinstance(f, In):
                e = field.isin(list(f.value))
            elif isinstance(f, IsNotNull):
                e = field.is_valid()
            elif isinstance(f, StringStartsWith):
                e = pc.starts_with(field, f.value)
            else:  # pragma: no cover — pushFilters only admits the above
                continue
            expr = e if expr is None else expr & e
        return expr


@dataclass
class FileCommit(WriterCommitMessage):
    """One staged file per write task (the bulkload 'HFile per region')."""

    staged: str | None
    rows: int


class AstroLayoutArrowWriter(DataSourceArrowWriter):
    """Write path (bulkload analog, A6): each task streams its Arrow batches
    into a staged parquet file; the driver-side commit() atomically publishes
    all staged files (rename + _SUCCESS), abort() discards them. On a real
    cluster the staging dir would be an object-store prefix; the two-phase
    task-write → driver-commit protocol is the same."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self._path = options["path"]
        self._overwrite = overwrite
        import uuid

        self._staging = os.path.join(self._path, f"_staging-{uuid.uuid4().hex}")

    def write(self, iterator) -> FileCommit:
        import uuid

        import pyarrow.parquet as pq

        os.makedirs(self._staging, exist_ok=True)
        out = os.path.join(self._staging, f"task-{uuid.uuid4().hex}.parquet")
        writer = None
        rows = 0
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(out, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is None:  # empty task partition: nothing to publish
            return FileCommit(None, 0)
        writer.close()
        return FileCommit(out, rows)

    def commit(self, messages) -> None:
        import shutil

        if self._overwrite:
            for f in _list_parquet_files(self._path):
                os.remove(f)
        staged = [m.staged for m in messages if m is not None and m.staged]
        for i, src in enumerate(sorted(staged)):
            os.replace(src, os.path.join(self._path, f"part-{i:05d}.parquet"))
        shutil.rmtree(self._staging, ignore_errors=True)
        with open(os.path.join(self._path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._staging, ignore_errors=True)


class AstroStreamWriter(DataSourceStreamWriter):
    """Streaming sink half of the connector: each micro-batch task stages a
    parquet file, then per-batch commit() publishes them under a
    batch-stamped name — exactly-once lands via the idempotent rename plus
    the engine's checkpointed batch tracking (a replayed batch republishes
    the same batch id, overwriting rather than duplicating)."""

    def __init__(self, options: dict) -> None:
        self._path = options["path"]
        self._staging = os.path.join(self._path, "_stream_staging")

    def write(self, iterator) -> FileCommit:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        if not rows:
            return FileCommit(None, 0)
        os.makedirs(self._staging, exist_ok=True)
        cols = rows[0].__fields__
        tbl = pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)})
        out = os.path.join(self._staging, f"task-{uuid.uuid4().hex}.parquet")
        pq.write_table(tbl, out)
        return FileCommit(out, len(rows))

    def commit(self, messages, batchId: int) -> None:
        staged = [m.staged for m in messages if m is not None and m.staged]
        for i, src in enumerate(sorted(staged)):
            os.replace(
                src, os.path.join(self._path, f"batch-{batchId:05d}-{i:03d}.parquet")
            )

    def abort(self, messages, batchId: int) -> None:
        import shutil

        shutil.rmtree(self._staging, ignore_errors=True)


class AstroStreamReader(SimpleDataSourceStreamReader):
    """Streaming read path: replays a parquet file as deterministic
    micro-batches of ``batch_rows`` rows. Offsets are plain row positions
    ({"row": N}) — monotonic, checkpointable, and replayable:
    ``readBetweenOffsets`` re-produces any committed range exactly, which
    is what gives a restarted query exactly-once output. The streaming
    analog of the batch reader's region scan: at scale the offset would be
    a (file, row-group) cursor over an append-only table, same protocol."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path or not os.path.isfile(path):
            raise ValueError("astro_layout stream requires .option('path', <file>)")
        self._path = path
        self._batch = int(options.get("batch_rows", "128"))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _slice(self, start: int, end: int):
        import pyarrow.parquet as pq

        table = pq.read_table(self._path)
        table = table.cast(_target_arrow_schema(table.schema))
        chunk = table.slice(start, max(end - start, 0))
        cols = [c.to_pylist() for c in chunk.columns]
        return iter(list(zip(*cols))) if cols else iter([])

    def read(self, start: dict):
        import pyarrow.parquet as pq

        total = pq.ParquetFile(self._path).metadata.num_rows
        lo = start["row"]
        hi = min(lo + self._batch, total)
        if lo >= total:  # caught up: empty batch, offset unchanged
            return iter([]), start
        return self._slice(lo, hi), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._slice(start["row"], end["row"])


class AstroLayoutDataSource(DataSource):
    """``spark.read.format("astro_layout").option("path", p).load()`` /
    ``df.write.format("astro_layout").option("path", p).save()`` /
    ``spark.readStream.format("astro_layout").option("path", f).load()``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        first = _list_parquet_files(self.options["path"])[0]
        return from_arrow_schema(_target_arrow_schema(pq.ParquetFile(first).schema_arrow))

    def reader(self, schema: StructType) -> AstroLayoutReader:
        return AstroLayoutReader(dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> AstroLayoutArrowWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("astro_layout requires .option('path', <dir>)")
        os.makedirs(path, exist_ok=True)
        return AstroLayoutArrowWriter(dict(self.options), overwrite)

    def simpleStreamReader(self, schema: StructType) -> AstroStreamReader:
        return AstroStreamReader(dict(self.options))

    def streamWriter(self, schema: StructType, overwrite: bool) -> AstroStreamWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("astro_layout requires .option('path', <dir>)")
        os.makedirs(path, exist_ok=True)
        return AstroStreamWriter(dict(self.options))


def register(spark: SparkSession) -> None:
    # Runtime-settable; required or Spark refuses a reader with pushFilters().
    # Set here (not only in session.py) because the driver may hand us a
    # vanilla session.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(AstroLayoutDataSource)


_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_N_RANGES = 8


def ensure_range_layout(spark: SparkSession, sf_dir: str, table: str, key: str) -> str:
    """Write ``table`` as N range-partitioned, key-sorted parquet files (the
    bulkload/region layout, A6) — idempotent per (sf, table)."""
    out = os.path.join(
        _REPO_ROOT, "spark-warehouse", f"astro_layout_{os.path.basename(sf_dir)}_{table}"
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load_table(spark, sf_dir, table)
            .repartitionByRange(_N_RANGES, key)
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .parquet(out)
        )
    return out


@query(
    "dsv2_scan_pushdown",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    WHERE l_orderkey >= 1000 AND l_orderkey < 3000 AND l_quantity < 25.0
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def dsv2_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full connector path: range-layout write → astro_layout scan with the
    key-range + quantity predicates pushed into the source (pruning ~7/8
    range files via footer stats, exact pyarrow filtering inside read()) →
    aggregate. Oracle is the plain scan — the connector must be invisible
    to results."""
    layout = ensure_range_layout(spark, sf_dir, "lineitem", "l_orderkey")
    register(spark)
    li = spark.read.format(FORMAT_NAME).option("path", layout).load()
    return (
        li.filter(
            (F.col("l_orderkey") >= 1000)
            & (F.col("l_orderkey") < 3000)
            & (F.col("l_quantity") < 25.0)
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
        .orderBy("l_returnflag")
    )


@query(
    "dsv2_write_roundtrip",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey < 5000
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def dsv2_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connector write path: a filtered orders slice goes OUT through the
    astro_layout Arrow writer (task-staged files, driver-side atomic commit)
    and comes back IN through the pushdown reader; the aggregate must match
    the original table. Write+read through the same custom source is the
    DDL/bulkload/scan round-trip of the reference in one query."""
    register(spark)
    out = os.path.join(_REPO_ROOT, "spark-warehouse", f"astro_write_roundtrip-{os.getpid()}")
    (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 5000)
        .repartition(4)
        .write.format(FORMAT_NAME)
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    back = spark.read.format(FORMAT_NAME).option("path", out).load()
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("o_orderstatus")
    )


def _quarter_batch_rows(sf_dir: str) -> str:
    """batch_rows sized so the stream replays in ~4 micro-batches at ANY
    scale factor. A fixed batch SIZE makes micro-batch count O(n) — 40
    full query cycles at sf0.1 (~1 s scheduler overhead each); fixing the
    batch COUNT keeps the multi-batch replay semantics under test while
    staying O(1) in scheduling overhead as data grows."""
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return str(max(128, (n + 3) // 4))


@query(
    "dsv2_stream_read",
    oracle="""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def dsv2_stream_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan through the custom connector: the documents table
    replayed as row-offset micro-batches by AstroStreamReader, aggregated
    with a complete-mode memory sink, drained with processAllAvailable().
    The result equals the batch aggregate (the oracle) — micro-batching is
    an execution detail, not a semantics change. Exercises the full Python
    streaming-source protocol: initialOffset → read → checkpoint commit,
    with readBetweenOffsets providing replay for recovery."""
    import tempfile
    import uuid

    register(spark)
    stream = (
        spark.readStream.format(FORMAT_NAME)
        .option("path", f"{sf_dir}/documents.parquet")
        .option("batch_rows", _quarter_batch_rows(sf_dir))
        .load()
    )
    agg = stream.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )
    name = f"brs_dsv2_stream_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="brs_ckpt_"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(name).orderBy("lang")


@query(
    "dsv2_stream_write",
    oracle="""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def dsv2_stream_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full streaming ROUND-TRIP through the custom connector: documents
    replayed as micro-batches by AstroStreamReader, landed by
    AstroStreamWriter (task-staged files, per-batch atomic publish), then
    read back from the landed files — the aggregate must equal the batch
    table. With dsv2_scan_pushdown / dsv2_write_roundtrip /
    dsv2_stream_read this completes all four connector planes (batch+stream
    x read+write), the full Astro-connector parity matrix."""
    import shutil
    import tempfile
    import uuid

    register(spark)
    out = os.path.join(_REPO_ROOT, "spark-warehouse", f"astro_stream_write-{os.getpid()}")
    shutil.rmtree(out, ignore_errors=True)
    stream = (
        spark.readStream.format(FORMAT_NAME)
        .option("path", f"{sf_dir}/documents.parquet")
        .option("batch_rows", _quarter_batch_rows(sf_dir))
        .load()
    )
    q = (
        stream.writeStream.format(FORMAT_NAME)
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="brs_ckpt_"))
        .queryName(f"brs_dsv2_sw_{uuid.uuid4().hex[:8]}")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    back = spark.read.parquet(out)
    return (
        back.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang")
    )
