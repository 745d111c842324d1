"""File-format connectors (SURVEY.md §2B: formats/connectors row).

The reference's only source is an ``XmlReader`` (Parser.cs:12); the engine
generalizes to the standard lake formats through Spark's built-in sources so
every scan benefits from predicate pushdown, column pruning, and (for
parquet) partition pruning.  These helpers fix the options we rely on
everywhere (header/schema handling, timestamp behavior) so callers at any
scale get the same semantics.

Writers default to snappy parquet — the only format we recommend as a sink
at 100 TB.  ``write_partitioned`` and ``write_bucketed`` encode the two
layout strategies that matter at scale: partition columns for pruning
(low-cardinality, e.g. date), bucketing for shuffle-free joins on a hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning story as parquet (predicate +
    column pruning reach the reader; min/max stripe stats prune splits)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the external spark-avro module is usable as a data source.
    Resolution goes through Spark's own provider lookup (a bare class-file
    probe is not enough: pyspark ships some avro classes without the
    DataSourceRegister service entry)."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:  # noqa: BLE001 — AnalysisException via py4j
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (row-oriented; schema travels with the file).  Requires the
    spark-avro package — add ``--packages org.apache.spark:spark-avro_2.13:<ver>``
    on a real deployment; raises with that guidance when absent."""
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro is not on the classpath; deploy with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if not avro_available(df.sparkSession):
        raise RuntimeError(
            "spark-avro is not on the classpath; deploy with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    df.write.mode(mode).format("avro").save(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan.  Always pass a schema in production: inference reads the
    data twice and silently widens types."""
    r = spark.read.option("header", str(header).lower())
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines scan; explicit schema avoids the inference pass and keeps
    corrupt records in ``_corrupt_record`` (PERMISSIVE), mirroring the
    reference's error-context wrapping (Parser.cs:146-149)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC scan.  Without partitioning options the read is a single task —
    never acceptable for large tables, so the bounds are first-class here."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 32))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Layout for partition pruning: one directory per value combination.
    Keep the combined cardinality in the thousands, not millions — each
    partition should hold >= 100 MB of parquet at the target scale."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Bucketed table: joins/aggregations on ``bucket_col`` between
    co-bucketed tables skip the shuffle entirely (Catalyst sees the
    HashPartitioning as satisfied).  The 100 TB pattern for repeated joins
    on the same key (e.g. lineitem/orders on orderkey).  ``path`` makes the
    table external (data at the given location instead of the warehouse)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def zorder_expr(df: DataFrame, cols: list[str], bits: int = 12):
    """Z-value (Morton code) column interleaving the bits of min-max
    normalized column values — entirely JVM expressions, whole-stage
    codegen friendly.  One stats pass computes the per-column domain."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    quantized = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        q = F.least(
            F.lit(top),
            ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top).cast("bigint"),
        )
        quantized.append(F.coalesce(q, F.lit(0)))
    z = F.lit(0).cast("bigint")
    k = len(cols)
    for bit in range(bits):
        for j, q in enumerate(quantized):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, bit).bitwiseAND(F.lit(1)), bit * k + j)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional clustering (the OPTIMIZE ZORDER layout): range-
    partition and sort by the interleaved z-value so every output file
    covers a tight hyper-rectangle of ALL ``cols`` at once.  Parquet
    min/max footers then prune files for predicates on ANY clustered
    column — single-column sort gives that for one column only.  The
    100 TB pattern for multi-predicate scan workloads; the only extra
    cost is one range shuffle at write time."""
    z = zorder_expr(df, cols, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Rewrite a fragmented dataset into ~``target_mb`` files (the
    small-files compaction every long-running ingest eventually needs:
    streaming sinks and fine-grained partitions accrete kilobyte files
    that crush scan planning and the NameNode/listing path).

    Sizing is computed from the dataset's actual on-disk bytes, then the
    rewrite is a single ``coalesce`` (no shuffle — merging is the point;
    use repartition only when also re-clustering).  Writes to a temp
    sibling then swaps, so a failed rewrite never destroys the input.
    Returns the new file count."""
    import math
    import os
    import shutil

    size = 0
    for dirpath, _, files in os.walk(path):
        size += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    n_files = max(1, math.ceil(size / (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(tmp)
    backup = path.rstrip("/") + "__compact_old"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return n_files
