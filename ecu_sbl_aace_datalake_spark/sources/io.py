"""Table IO: read / write / drop / list over a path-addressed lakehouse.

Reference parity (all in common.py):
- ``selectTable`` / ``selectView`` / ``__selectTable`` (440-467): load Delta
  by path, register uuid temp view, run SQL over it.
- ``readTable`` (475-489): projection+condition read — **buggy in the
  reference** (missing space before WHERE, and the built query never passed
  through; SURVEY.md §8 #1). Implemented correctly here.
- ``writeTable`` (525-538): overwrite-write with optional partitioning +
  schema overwrite, register in the session registry, return shape info.
- ``dropTable`` (512-517): reference bug #2 — it row-deletes instead of
  dropping and crashes when spark arg omitted. Here: a real drop.
- ``getTables`` (497-503): enumerate tables under the Tables/ root.

Format: Delta when ``delta-spark`` is importable (the reference is
Delta-only, common.py:448/531), else Parquet — same code path, the
lakehouse layout and semantics are identical. All writes are overwrite-mode
with schema overwrite, matching the reference.

Scale notes:
- ``write_table(partition_by=...)`` controls physical layout → later reads
  get partition pruning for free (Catalyst PruneFileSourcePartitions).
- ``read_table`` pushes ``columns``/``condition`` into the scan via
  ``.select``/``.where`` so Parquet/Delta sees PushedFilters + pruned
  ReadSchema instead of a full-width scan.
- ``df_shape`` after write does cost one count(); ``write_table`` makes it
  opt-in (``with_shape=False`` default) instead of always recomputing the
  full plan like the reference (common.py:533, SURVEY.md §8 #6).
"""

from __future__ import annotations

import posixpath
import shutil
from typing import Any
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Lakehouse, TableRegistry, table_path, view_path

try:  # delta-spark is optional; parquet is the fallback persistence format
    from delta.tables import DeltaTable  # noqa: F401

    _HAS_DELTA = True
except Exception:  # pragma: no cover - environment dependent
    _HAS_DELTA = False

DEFAULT_FORMAT = "delta" if _HAS_DELTA else "parquet"


def read_path(spark: SparkSession, path: str, fmt: str = DEFAULT_FORMAT) -> DataFrame:
    """Load a table by physical path (reference common.py:448)."""
    return spark.read.format(fmt).load(path)


def path_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API — correct for ANY
    storage URI (abfss/s3/hdfs/file). ``os.path`` checks only see the
    driver-local filesystem and silently return False for remote tables."""
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(path)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hp))


def table_exists(spark: SparkSession, lakehouse: Lakehouse, table_name: str) -> bool:
    """Whether ``{lakehouse}/Tables/{table_name}`` exists in storage."""
    return path_exists(spark, table_path(lakehouse, table_name))


def select_table(
    spark: SparkSession,
    lakehouse: Lakehouse,
    table_name: str,
    query: str | None = None,
    fmt: str = DEFAULT_FORMAT,
) -> DataFrame:
    """Load ``{source}/Tables/{name}``, register a unique temp view, run
    ``query`` over it (default ``SELECT t.* FROM <view> AS t``).

    Reference: ``selectTable``/``__selectTable`` common.py:440-467. The
    query's view placeholder is ``{table}``.
    """
    from ..operators.query import temp_table_name

    df = read_path(spark, table_path(lakehouse, table_name), fmt)
    view = temp_table_name(table_name)
    df.createOrReplaceTempView(view)
    sql = (query or "SELECT t.* FROM {table} AS t").format(table=view)
    return spark.sql(sql)


def select_view(
    spark: SparkSession,
    lakehouse: Lakehouse,
    view_name: str,
    query: str | None = None,
    fmt: str = DEFAULT_FORMAT,
) -> DataFrame:
    """Same as :func:`select_table` under ``/Views/`` (common.py:461-462)."""
    from ..operators.query import temp_table_name

    df = read_path(spark, view_path(lakehouse, view_name), fmt)
    view = temp_table_name(view_name)
    df.createOrReplaceTempView(view)
    sql = (query or "SELECT t.* FROM {table} AS t").format(table=view)
    return spark.sql(sql)


def read_table(
    spark: SparkSession,
    lakehouse: Lakehouse,
    table_name: str,
    columns: str | list[str] = "*",
    condition: str = "",
    fmt: str = DEFAULT_FORMAT,
) -> DataFrame:
    """Projection + filter read. Fixes reference ``readTable``
    (common.py:475-489, SURVEY.md §8 #1): the projection and condition are
    actually applied, and applied *declaratively* so Catalyst pushes the
    filter and prunes columns at the file scan."""
    df = read_path(spark, table_path(lakehouse, table_name), fmt)
    if columns not in ("*", ["*"], None):
        cols = [c.strip() for c in columns.split(",")] if isinstance(columns, str) else list(columns)
        df = df.select(*cols)
    if condition:
        df = df.where(condition)
    return df


def write_table(
    lakehouse: Lakehouse,
    table_name: str,
    df: DataFrame,
    partition_by: str | list[str] | None = None,
    fmt: str = DEFAULT_FORMAT,
    registry: TableRegistry | None = None,
    with_shape: bool = False,
) -> dict[str, Any]:
    """Overwrite-write ``df`` at ``{source}/Tables/{name}``.

    Reference ``writeTable`` common.py:525-538 with two fixes (SURVEY.md §8
    #6): the writer builder is chained (the reference discarded
    ``partitionBy``'s return value), and the extra full recomputation for
    shape info is opt-in.
    """
    path = table_path(lakehouse, table_name)
    writer = df.write.format(fmt).mode("overwrite")
    if fmt == "delta":
        writer = writer.option("overwriteSchema", "true")
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.save(path)

    info: dict[str, Any] = {
        "table": table_name,
        "path": path,
        "format": fmt,
        "partition_by": partition_by,
        "n_cols": len(df.columns),
        "columns": list(df.columns),
    }
    if with_shape:
        info["rows"] = df.count()
    if registry is not None:
        registry.register(table_name, df, info)
    return info


def write_view(
    lakehouse: Lakehouse,
    view_name: str,
    df: DataFrame,
    fmt: str = DEFAULT_FORMAT,
) -> dict[str, Any]:
    """Materialize a DataFrame under ``{source}/Views/{name}`` — the write
    side of :func:`select_view` (the reference could read Views but never
    write them; common.py:390-392 only composed the path)."""
    path = view_path(lakehouse, view_name)
    writer = df.write.format(fmt).mode("overwrite")
    if fmt == "delta":
        writer = writer.option("overwriteSchema", "true")
    writer.save(path)
    return {"view": view_name, "path": path, "format": fmt}


def drop_table(spark: SparkSession, lakehouse: Lakehouse, table_name: str, fmt: str = DEFAULT_FORMAT) -> None:
    """Actually drop the table (reference bug #2: ``dropTable``
    common.py:512-517 only row-deletes and crashes without a spark arg).

    For local paths the directory is removed; for remote URIs the Hadoop
    FileSystem API is used via the JVM gateway.
    """
    path = table_path(lakehouse, table_name)
    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        shutil.rmtree(parsed.path or path, ignore_errors=True)
        return
    jvm = spark._jvm  # remote object stores: delete via Hadoop FS
    jsc = spark._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    fs.delete(hadoop_path, True)


def list_tables(spark: SparkSession, lakehouse: Lakehouse) -> list[str]:
    """Enumerate table names under the Tables/ root (reference ``getTables``
    common.py:497-503 globbed a locally-mounted dir; here: Hadoop FS listing,
    which works for any URI scheme without mounting)."""
    import os

    root = lakehouse.tables_path
    parsed = urlparse(root)
    if parsed.scheme in ("", "file"):
        p = parsed.path or root
        if not os.path.isdir(p):
            return []
        return sorted(d for d in os.listdir(p) if os.path.isdir(os.path.join(p, d)))
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path(root)
    fs = hadoop_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hadoop_path):
        return []
    return sorted(
        st.getPath().getName() for st in fs.listStatus(hadoop_path) if st.isDirectory()
    )


def write_bucketed_table(
    spark: SparkSession,
    table_name: str,
    df: DataFrame,
    bucket_cols: str | list[str],
    n_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Bucketed (hash-clustered) catalog table: rows are pre-partitioned by
    ``hash(bucket_cols) % n_buckets`` at write time, so a join or aggregate
    on the bucket key needs NO shuffle at read time — the single biggest
    lever for repeated large-fact joins at 100 TB (pay the shuffle once at
    write, never again). ``sort_cols`` additionally pre-sorts within
    buckets, removing the sort from sort-merge joins.

    Bucketing requires the session catalog (``saveAsTable``); pick
    ``n_buckets`` so each bucket file lands near your target file size at
    full scale (e.g. 100 TB / 128 MB ≈ 800k → bucket by thousands, not 32).
    """
    bcols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    # idempotence: DROP an existing registration, then clear any ORPHANED
    # managed-table location (a table dir left by another session's
    # metastore makes saveAsTable fail with LOCATION_ALREADY_EXISTS even
    # though the current catalog has no such table)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    orphan = f"{warehouse.rstrip('/')}/{table_name.lower()}"
    if path_exists(spark, orphan):
        jvm = spark._jvm
        hp = jvm.org.apache.hadoop.fs.Path(orphan)
        hp.getFileSystem(spark._jsc.hadoopConfiguration()).delete(hp, True)
    # One file per bucket: repartition on the bucket key into exactly
    # n_buckets partitions BEFORE the bucketed write. repartition and
    # bucketBy share the same Murmur3 pmod placement, so each write task
    # holds exactly one bucket's rows — without this, every input
    # partition emits a file into every bucket it touches (observed:
    # 1,384 files for a 1.5 MB index, making the bucket-pruned probe
    # SLOWER than an unindexed scan at bench scale).
    writer = (
        df.repartition(n_buckets, *[F.col(c) for c in bcols])
        .write.format(fmt).mode("overwrite").bucketBy(n_buckets, *bcols)
    )
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*scols)
    writer.saveAsTable(table_name)


def append_table(
    lakehouse: Lakehouse,
    table_name: str,
    df: DataFrame,
    fmt: str = DEFAULT_FORMAT,
) -> None:
    """Append-mode write (the reference supported only overwrite,
    common.py:529-531). With Delta this is transactional; with parquet new
    files land beside the old — read back with ``merge_schema=True`` if the
    appended frame added columns."""
    writer = df.write.format(fmt).mode("append")
    if fmt == "delta":
        writer = writer.option("mergeSchema", "true")
    writer.save(table_path(lakehouse, table_name))


def read_table_merged(
    spark: SparkSession, lakehouse: Lakehouse, table_name: str, fmt: str = DEFAULT_FORMAT
) -> DataFrame:
    """Read with schema merging across heterogeneous parquet files (schema
    evolution on the read path; Delta resolves from its log instead)."""
    reader = spark.read.format(fmt)
    if fmt == "parquet":
        reader = reader.option("mergeSchema", "true")
    return reader.load(table_path(lakehouse, table_name))


def table_file_stats(spark: SparkSession, lakehouse: Lakehouse, table_name: str) -> dict[str, Any]:
    """(n_files, total_bytes) under a table path — the compaction signal."""
    import os

    root = table_path(lakehouse, table_name)
    parsed = urlparse(root)
    n, size = 0, 0
    if parsed.scheme in ("", "file"):
        for dirpath, _dirs, files in os.walk(parsed.path or root):
            for f in files:
                if not f.startswith(("_", ".")):
                    n += 1
                    size += os.path.getsize(os.path.join(dirpath, f))
        return {"n_files": n, "total_bytes": size}
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(root)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hp, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not (name.startswith("_") or name.startswith(".")):
            n += 1
            size += st.getLen()
    return {"n_files": n, "total_bytes": size}


def compact_table(
    spark: SparkSession,
    lakehouse: Lakehouse,
    table_name: str,
    target_file_mb: int = 128,
    fmt: str = DEFAULT_FORMAT,
    partition_by: str | list[str] | None = None,
) -> dict[str, Any]:
    """Small-file compaction (the OPTIMIZE of this engine): rewrite the
    table into ``ceil(total_bytes / target)`` files.

    Small files are the classic lakehouse death-by-a-thousand-cuts at scale:
    each file costs a task + a footer read + a metadata entry. Streaming and
    frequent appends produce them; periodic compaction restores scan
    efficiency. Parquet path: write compacted data to a sibling tmp dir and
    atomically swap (readers mid-swap see old or new, never half). Delta
    would instead rewrite transactionally via its log.

    Returns before/after file stats.
    """
    import math
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    before = table_file_stats(spark, lakehouse, table_name)
    path = table_path(lakehouse, table_name)
    n_out = max(1, math.ceil(before["total_bytes"] / (target_file_mb * 1024 * 1024)))
    df = read_path(spark, path, fmt)
    tmp = f"{path}__compact_{uuid.uuid4().hex}"
    if partition_by:
        # partitioned table: preserve the layout — repartition on the
        # partition columns (one output file per partition value) and write
        # partitionBy, otherwise compaction would silently flatten the
        # table and break partition pruning
        pcols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = (
            df.repartition(*[F.col(c) for c in pcols])
            .write.format(fmt)
            .mode("overwrite")
            .partitionBy(*pcols)
        )
        writer.save(tmp)
    else:
        # coalesce (no shuffle) is enough to merge files; repartition would
        # add an exchange only to re-split — unnecessary for pure compaction
        df.coalesce(n_out).write.format(fmt).mode("overwrite").save(tmp)
    _atomic_swap(spark, path, tmp)
    after = table_file_stats(spark, lakehouse, table_name)
    return {"before": before, "after": after, "target_files": n_out}


def _atomic_swap(spark: SparkSession, path: str, tmp: str) -> None:
    """Replace the table dir at ``path`` with ``tmp`` via rename — readers
    mid-swap see old or new, never half."""
    import os
    import shutil
    import uuid

    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        old, new = parsed.path or path, urlparse(tmp).path or tmp
        back = f"{old}__old_{uuid.uuid4().hex}"
        os.rename(old, back)
        os.rename(new, old)
        shutil.rmtree(back, ignore_errors=True)
    else:
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        back = jvm.org.apache.hadoop.fs.Path(f"{path}__old_{uuid.uuid4().hex}")
        fs.rename(jvm.org.apache.hadoop.fs.Path(path), back)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jvm.org.apache.hadoop.fs.Path(path))
        fs.delete(back, True)


def cluster_table(
    spark: SparkSession,
    lakehouse: Lakehouse,
    table_name: str,
    by: str | list[str],
    n_files: int | None = None,
    fmt: str = DEFAULT_FORMAT,
) -> dict[str, Any]:
    """Sort-clustered rewrite — the CLUSTER BY / (1-D) Z-ORDER of this
    engine: range-repartition on the clustering key(s), sort within each
    partition, rewrite, atomic swap.

    After the rewrite every file covers a narrow, non-overlapping range of
    the key, so parquet footer min/max stats (or Delta per-file stats) let a
    filter on that key skip whole files/row-groups instead of scanning the
    table. This is what makes selective queries on a 100 TB fact table read
    gigabytes, not terabytes — compaction fixes file COUNT,
    clustering fixes file RANGES; run both.

    The range partitioner samples the key distribution, so skewed keys
    still produce balanced files. Returns before/after stats.
    """
    cols = [by] if isinstance(by, str) else list(by)
    before = table_file_stats(spark, lakehouse, table_name)
    path = table_path(lakehouse, table_name)
    df = read_path(spark, path, fmt)
    n_out = n_files or max(1, before["n_files"])
    out = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
    import uuid

    tmp = f"{path}__cluster_{uuid.uuid4().hex}"
    out.write.format(fmt).mode("overwrite").save(tmp)
    _atomic_swap(spark, path, tmp)
    after = table_file_stats(spark, lakehouse, table_name)
    return {"before": before, "after": after, "clustered_by": cols, "files": n_out}


def zorder_table(
    spark: SparkSession,
    lakehouse: Lakehouse,
    table_name: str,
    by: list[str],
    n_files: int | None = None,
    bits: int | None = None,
    fmt: str = DEFAULT_FORMAT,
) -> dict[str, Any]:
    """Multi-dimensional clustered rewrite: sort the table by the Morton
    (Z-order) code of ``by`` and rewrite with the same atomic swap as
    :func:`cluster_table`.

    Where ``cluster_table`` gives file-level skipping on ONE key,
    Z-ordering splits the skipping power across all ``by`` columns: each
    file covers a narrow range of EVERY key (≈ global_range /
    n_files^(1/k)), so selective filters on any of them prune files. Use
    for fact tables queried by several independent dimensions (date +
    customer + part); keep 1-D clustering when one key dominates.

    Costs one stats job (min/max per key) + one full rewrite; the Morton
    code is a pure shift/mask expression (functions/zorder.py), so the
    sort stays in whole-stage codegen.
    """
    from pyspark.sql import functions as F

    from ..functions.zorder import zvalue

    before = table_file_stats(spark, lakehouse, table_name)
    path = table_path(lakehouse, table_name)
    df = read_path(spark, path, fmt)
    n_out = n_files or max(1, before["n_files"])
    z = zvalue(df, by, bits=bits)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n_out, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    import uuid

    tmp = f"{path}__zorder_{uuid.uuid4().hex}"
    out.write.format(fmt).mode("overwrite").save(tmp)
    _atomic_swap(spark, path, tmp)
    after = table_file_stats(spark, lakehouse, table_name)
    return {"before": before, "after": after, "zordered_by": list(by), "files": n_out}


def ns_to_timestamp(df: DataFrame, *cols: str) -> DataFrame:
    """Convert long nanosecond-epoch columns (parquet TIMESTAMP(NANOS) read
    under ``spark.sql.legacy.parquet.nanosAsLong``) to timestamps, truncating
    to microseconds exactly as DuckDB does when reading the same files."""
    from pyspark.sql import functions as F

    for c in cols:
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver fixture table; normalizes the events nanosecond ts.

    Works on ANY session: ``spark.sql.legacy.parquet.nanosAsLong`` is a
    runtime SQL conf, set here defensively because sessions not built by
    :func:`~..session.get_spark` (e.g. a test driver's own session) would
    otherwise fail with PARQUET_TYPE_ILLEGAL on nanosecond timestamps."""
    # UTC pin: parquet timestamps are naive; a non-UTC session would shift
    # date_format/window outputs relative to engines reading them naively
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # ANSI pin: Spark 4 defaults ANSI on; this engine's semantics (null-on-
    # failure casts matching the reference's castColumns, division safety)
    # are defined under ANSI-off — same value session.get_spark sets. A
    # runtime conf, so it applies to any externally-built session too.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = ns_to_timestamp(df, "ts")
    return df


def load_star(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the driver's parquet fixture tables from ``sf_dir`` (TESTDATA.md)."""
    names = tables or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    bad_records_col: str | None = None,
    **options: Any,
) -> DataFrame:
    """CSV ingestion (the reference reads Delta only — common.py:448; raw-file
    ingestion is table stakes for a lakehouse, so it's first-class here).

    Pass an explicit ``schema`` DDL string in production: schema inference
    costs a full extra pass over the files — at 100 TB that's a second scan
    before the first real job. With ``bad_records_col`` set, malformed lines
    land in that column (PERMISSIVE) instead of failing the job; without it,
    FAILFAST surfaces bad data at read time rather than as silent nulls.
    """
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(
            schema if bad_records_col is None else f"{schema}, {bad_records_col} STRING"
        )
        reader = reader.option(
            "mode", "PERMISSIVE" if bad_records_col else "FAILFAST"
        )
        if bad_records_col:
            reader = reader.option("columnNameOfCorruptRecord", bad_records_col)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    bad_records_col: str | None = None,
    **options: Any,
) -> DataFrame:
    """JSON-Lines ingestion; same schema/corrupt-record contract as
    :func:`read_csv`. (Multi-line JSON documents need ``multiLine=True`` —
    note that multiLine makes each FILE one record, killing input-split
    parallelism; at scale, always prefer JSONL.)"""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(
            schema if bad_records_col is None else f"{schema}, {bad_records_col} STRING"
        )
        reader = reader.option(
            "mode", "PERMISSIVE" if bad_records_col else "FAILFAST"
        )
        if bad_records_col:
            reader = reader.option("columnNameOfCorruptRecord", bad_records_col)
    return reader.json(path)


def export_files(
    lakehouse: Lakehouse,
    name: str,
    df: DataFrame,
    fmt: str = "csv",
    single_file: bool = False,
    **options: Any,
) -> dict[str, Any]:
    """Export a DataFrame under ``{source}/Files/{name}`` as
    csv/json/parquet/orc — the interchange sink (Delta/parquet under Tables/
    stays the analytic format; Files/ is for handing data to external
    consumers, mirroring the reference lakehouse's Tables/Files split,
    common.py:313-327).

    ``single_file=True`` coalesces to one output file — only for small
    exports (it serializes the final write); large exports keep one file per
    partition.
    """
    if fmt not in ("csv", "json", "parquet", "orc"):
        raise ValueError(f"unsupported export format: {fmt!r}")
    path = posixpath.join(lakehouse.files_path, name)
    out = df.coalesce(1) if single_file else df
    writer = out.write.format(fmt).mode("overwrite").options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    return {"name": name, "path": path, "format": fmt}


def vacuum_orphans(lakehouse: Lakehouse, dry_run: bool = False) -> list[str]:
    """Remove orphaned rewrite artifacts under ``Tables/``: the
    ``__compact_*`` / ``__cluster_*`` staging dirs and ``__old_*`` backups
    that an interrupted :func:`compact_table`/:func:`cluster_table` can
    leave behind (the swap itself is atomic; the cleanup after it isn't).

    The VACUUM of this engine's parquet path (Delta has its own). Matches
    ONLY the engine's own suffix conventions — never user tables. Returns
    the removed (or, with ``dry_run``, would-be-removed) paths.
    """
    import os
    import re
    import shutil

    pat = re.compile(r"__(compact|cluster|old)_[0-9a-f]{32}$")
    root = urlparse(lakehouse.tables_path).path or lakehouse.tables_path
    removed: list[str] = []
    if not os.path.isdir(root):
        return removed
    for entry in sorted(os.listdir(root)):
        if pat.search(entry):
            full = os.path.join(root, entry)
            removed.append(full)
            if not dry_run:
                shutil.rmtree(full, ignore_errors=True)
    return removed


def zone_map(
    spark: SparkSession,
    lakehouse: Lakehouse,
    table_name: str,
    cols: list[str],
    fmt: str = DEFAULT_FORMAT,
) -> DataFrame:
    """Per-FILE min/max zone map for ``cols`` — the data-skipping index
    Delta/Iceberg keep in their metadata, computed openly with one
    aggregate over ``input_file_name()``.

    Output: ``(file, n_rows, <c>_min, <c>_max ...)`` — one row per data
    file. Combine with :func:`cluster_table` / :func:`zorder_table`
    (which make per-file ranges narrow) and :func:`read_pruned` (which
    consults the map to skip files). At 100 TB the map is ~1 row per
    128 MB file (thousands of rows, not billions) — cheap to persist as a
    table and rebuild incrementally per appended file.
    """
    df = read_path(spark, table_path(lakehouse, table_name), fmt)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def read_pruned(
    spark: SparkSession,
    lakehouse: Lakehouse,
    table_name: str,
    ranges: dict[str, tuple[Any, Any]],
    zmap: DataFrame | None = None,
    fmt: str = DEFAULT_FORMAT,
) -> tuple[DataFrame, dict[str, Any]]:
    """Range-predicate read that SKIPS whole files via a zone map, then
    applies the exact row filter — same rows as a plain filtered read,
    fewer files opened.

    ``ranges`` maps column -> (lo, hi) inclusive bounds (either side None
    for open). A file survives when every predicate's range overlaps the
    file's [min, max] (NULL stats — all-null column in a file — keep the
    file: skipping must be provably safe). Returns ``(df, info)`` where
    ``info`` reports files_total / files_read for observability; the
    returned plan lists surviving files explicitly, so the scan never
    touches a skipped file (footer or data).

    This is the engine-level analogue of parquet row-group pruning one
    level up: row-group stats still prune WITHIN the surviving files.
    """
    if zmap is None:
        zmap = zone_map(spark, lakehouse, table_name, list(ranges), fmt)
    keep = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            keep = keep & (F.col(f"{c}_max").isNull() | (F.col(f"{c}_max") >= F.lit(lo)))
        if hi is not None:
            keep = keep & (F.col(f"{c}_min").isNull() | (F.col(f"{c}_min") <= F.lit(hi)))
    files = [r.file for r in zmap.where(keep).select("file").collect()]
    total = zmap.count()
    df = spark.read.format(fmt).load(files) if files else read_path(
        spark, table_path(lakehouse, table_name), fmt
    ).limit(0)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.where(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col(c) <= F.lit(hi))
    return df, {"files_total": total, "files_read": len(files)}
