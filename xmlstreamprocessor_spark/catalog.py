"""Table loading for the driver-provided TPC-H-ish parquet star schema.

At 100 TB the same call pattern holds: ``spark.read.parquet`` is the only
scan API used anywhere in the engine, so predicate pushdown, column pruning,
and partition pruning all happen in the parquet source.  Nothing here ever
collects or caches eagerly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5 rows, nation=25 rows always; supplier/part grow slowly).
BROADCAST_DIMS = ("region", "nation")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # The driver has shipped events.ts under THREE parquet encodings
        # across rounds — TIMESTAMP(NANOS) (vectorized reader rejects it;
        # read as raw nanos long + truncate, the DuckDB/pyarrow ns->us
        # semantics), TIMESTAMP(MICROS) adjusted-to-UTC, and MICROS
        # not-adjusted (reads as TIMESTAMP_NTZ, which functions like
        # unix_micros refuse) — so normalize every variant to one session
        # TIMESTAMP here; under the UTC session zone the cast is
        # instant-identical.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_t = dict(df.dtypes).get("ts")
        if ts_t == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_t == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
