"""Table catalog: fixture loading + view registration.

The reference registered Cassandra SSTable snapshots as Hive external
tables via its StorageHandler (SURVEY.md §2 A5); here the equivalent
is ``spark.read`` + temp-view registration. Parquet is the stand-in
source until the SSTable DataSource (sources/) supersedes it on the
cassowary-native path — the query layer is source-agnostic either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

# Dimension tables small enough to broadcast at ANY scale factor —
# region/nation are fixed-cardinality (5/25 rows) even at 100 TB.
BROADCAST_DIMS = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, applying scan-time type normalization.

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark 4 refuses to
    read natively (PARQUET_TYPE_ILLEGAL); we read it as long via the
    legacy flag and floor-divide to microseconds — the exact mapping
    DuckDB applies when it reads the same file (verified empirically),
    so oracle comparisons agree to the microsecond.
    """
    # Pin UTC regardless of who built the session: fixture timestamps
    # are NTZ, and every oracle comparison assumes UTC wall clock.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a DataFrame keyed by name."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (the SQL entry point)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
