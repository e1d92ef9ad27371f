"""SparkSession bootstrap and table loading.

Scale notes (the engine targets ~100 TB on a 1000-executor cluster; tests
run on local[32]):

- AQE is on: runtime partition coalescing, skew-join splitting and
  dynamic join-strategy switching replace hand-tuned shuffle counts when
  input sizes change by 1000x.
- ``spark.sql.shuffle.partitions`` defaults to a small local value but is
  only the *initial* number — AQE coalesces/expands at runtime, so the same
  code is correct on a real cluster where the operator would set it (or let
  AQE derive it) to ~2-3x total cores.
- Arrow is enabled for every pandas interchange (Pandas UDFs, toPandas).
- Session timezone is pinned to UTC so timestamp semantics match the
  DuckDB oracle and are cluster-invariant.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver generates at /root/testdata/sf*/ (TESTDATA.md).
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



def get_spark(app_name: str = "randas_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the tuned local SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. On a real
    cluster the master/memory settings come from spark-submit and the
    builder here is a no-op (getOrCreate reuses the injected session);
    only the semantic configs (ANSI off, UTC, AQE) matter there.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime re-planning — partition coalescing, skew-join
        # handling, dynamic broadcast. Core to the 100TB design: plans
        # written here survive scale-up without retuning.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Initial shuffle parallelism ~ local cores; AQE coalesces below
        # this when partitions are tiny and splits skewed ones above it.
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for all Python<->JVM batch transfer (Pandas UDFs etc.).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The reference's semantics are non-ANSI (silent coercion); also
        # keeps Spark 4 defaults from raising on e.g. bad casts in parity ops.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # PySpark 4's DataFrame debugging captures the Python call site
        # for error context on EVERY DataFrame/Column API call — 3-4 JVM
        # round trips each (getActiveSession + conf.get + origin
        # set/clear). Profiled on rel_logreg_newton: 9106 py4j
        # send_commands per construction, ~1 s of a 2.8 s query
        # (OPTIMIZATION_r13.md). Driver-side overhead, scale-independent
        # — a production cluster driver pays it identically. Off here;
        # flip on when chasing an error's call site.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (columnar parquet scan; Catalyst pushes
    filters/projections into the scan — verify with .explain)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables and register each as a temp view so both
    the DataFrame DSL and ``spark.sql`` lifecycles are available."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
