"""Reference-surface operators as (Spark query, DuckDB oracle) pairs.

Each query re-expresses one operator from the reference's public surface
(SURVEY.md §2, citations into /root/reference/src) over the driver's
testdata tables. Parity quirks (sum-of-nothing = 0.0, query literal typing,
population-vs-sample std) are encoded identically on both sides.

Float discipline: every rounded value uses the engine-portable
``floor(x*scale+0.5)/scale`` (``fround`` / ``sql_fround``) — Spark's
``round`` (BigDecimal HALF_UP) and DuckDB's (float multiply) disagree on
exact .xx5 doubles. Sums→2dp, means→6dp, variance-family→4dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from randas_spark.queries import fround, register, sql_fround, t

# --------------------------------------------------------------------------
# Flagship: scan → filter → group → aggregate → sort (SURVEY.md §7.1).
# Covers the whole-column aggregate surface (reference dataframe.rs:186-368)
# generalized to grouped form, which the reference lacks (§2.12).
# --------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_fround('sum(l_quantity)', 2)}                                       AS sum_qty,
           {sql_fround('sum(l_extendedprice)', 2)}                                  AS sum_base_price,
           {sql_fround('sum(l_extendedprice * (1 - l_discount))', 2)}               AS sum_disc_price,
           {sql_fround('sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))', 2)} AS sum_charge,
           {sql_fround('avg(l_quantity)', 6)}                                       AS avg_qty,
           {sql_fround('avg(l_extendedprice)', 6)}                                  AS avg_price,
           {sql_fround('avg(l_discount)', 6)}                                       AS avg_disc,
           count(*)                                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary over lineitem.

    Scale: filter + projection push into the parquet scan; the groupBy is a
    2-key low-cardinality hash aggregate with map-side partial aggregation,
    so the shuffle carries only |groups|·|partitions| rows.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fround(F.sum("l_quantity"), 2).alias("sum_qty"),
            fround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            fround(F.sum(disc_price), 2).alias("sum_disc_price"),
            fround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            fround(F.avg("l_quantity"), 6).alias("avg_qty"),
            fround(F.avg("l_extendedprice"), 6).alias("avg_price"),
            fround(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Projection / column access (reference dataframe.rs:106-134, 379-388)
# --------------------------------------------------------------------------


@register(
    "ref_select_project",
    oracle="SELECT c_custkey, c_name, c_acctbal FROM customer",
)
def ref_select_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`column` / `collect_column_values` → df.select (dataframe.rs:106-108).

    Column pruning reaches the parquet footer: ReadSchema carries only the
    three columns.
    """
    return t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")


@register(
    "ref_add_column",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_fround('l_extendedprice * (1 - l_discount)', 2)} AS revenue
    FROM lineitem
    """,
)
def ref_add_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`add_column` → withColumn (dataframe.rs:137-165); computed column."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .withColumn(
            "revenue", fround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
        )
        .drop("l_extendedprice", "l_discount")
    )


@register(
    "ref_remove_column",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders",
)
def ref_remove_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`remove_column` → df.drop (dataframe.rs:168-182)."""
    return t(spark, sf_dir, "orders").drop("o_orderdate")


@register(
    "ref_shape",
    oracle="SELECT count(*) AS n_rows, 11 AS n_cols FROM lineitem",
)
def ref_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`shape` → (count, len(columns)) (dataframe.rs:347-351)."""
    li = t(spark, sf_dir, "lineitem")
    n_cols = len(li.columns)
    return li.agg(F.count(F.lit(1)).alias("n_rows")).withColumn("n_cols", F.lit(n_cols))


# --------------------------------------------------------------------------
# Filters / row selection (reference dataframe.rs:392-596, 822-885)
# --------------------------------------------------------------------------


@register(
    "ref_query_eq",
    oracle="SELECT * FROM orders WHERE o_orderstatus = 'F'",
)
def ref_query_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`query("col == literal")` (dataframe.rs:822-885): string equality.

    The predicate pushes into the parquet scan (PushedFilters).
    """
    return t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")


@register(
    "ref_query_int_literal_quirk",
    # Reference semantics: `query("l_quantity == 4")` parses 4 as Integer and
    # typed equality never matches Float cells (dataframe.rs:848-852) → empty.
    oracle="SELECT * FROM lineitem WHERE FALSE",
)
def ref_query_int_literal_quirk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query() literal-typing quirk: int literal vs double column → no rows.

    Reproduced via the parity parser in randas_spark.frame.parse_query.
    """
    from randas_spark.frame import query_predicate

    li = t(spark, sf_dir, "lineitem")
    return li.filter(query_predicate(li, "l_quantity == 4"))


@register(
    "ref_filter_closure",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 25.0",
)
def ref_filter_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`apply_condition` + `filter_by_condition` (dataframe.rs:514-550).

    The reference takes an arbitrary closure; for the built-in comparison
    shapes we compile to a Column expression (JVM-side, codegen) instead of
    a Python UDF — null-in → false matches Spark's 3-valued logic here.
    """
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(F.col("l_quantity") > 25.0)
    )


@register(
    "ref_head",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10",
)
def ref_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`head(n)` (dataframe.rs:553-570): first n under the ingest order.

    Spark plans orderBy+limit as TakeOrderedAndProject — no global sort.
    """
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(10)
    )


@register(
    "ref_tail",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_orderkey DESC LIMIT 10
    """,
)
def ref_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`tail(n)` (dataframe.rs:573-596): last n — TakeOrdered on the
    descending key, no global sort."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_orderkey").desc())
        .limit(10)
    )


@register(
    "ref_loc_rows",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               row_number() OVER (ORDER BY o_orderkey) - 1 AS __pos__
        FROM orders
    ) WHERE __pos__ % 100 = 0
    """,
)
def ref_loc_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`loc` positional row selection (dataframe.rs:392-438).

    Positional access needs a global order — inherently a single-partition
    window, kept only for reference parity. At scale, point/positional
    lookups are an anti-pattern (SURVEY.md §2.4); keyed filters are the
    scalable form.
    """
    w = Window.orderBy("o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn("__pos__", F.row_number().over(w) - 1)
        .filter(F.col("__pos__") % 100 == 0)
        .drop("__pos__")
    )


# --------------------------------------------------------------------------
# Whole-column aggregates incl. quirks (reference dataframe.rs:186-368)
# --------------------------------------------------------------------------


@register(
    "ref_agg_scalars",
    oracle=f"""
    SELECT {sql_fround('coalesce(sum(l_quantity), 0.0)', 2)} AS sum_val,
           {sql_fround('avg(l_quantity)', 6)}                AS mean_val,
           {sql_fround('min(l_quantity)', 2)}                AS min_val,
           {sql_fround('max(l_quantity)', 2)}                AS max_val,
           {sql_fround('var_samp(l_quantity)', 4)}           AS variance_val,
           {sql_fround('stddev_samp(l_quantity)', 4)}        AS std_dev_val,
           count(l_quantity)                                 AS count_val
    FROM lineitem
    """,
)
def ref_agg_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum/mean/min/max/variance/std_dev/count (dataframe.rs:186-368).

    Reference semantics: sample variance (n-1, dataframe.rs:297-298),
    sum-of-nothing = 0.0 (coalesce), count = non-null count.
    One job, all aggregates fused in a single partial+final hash agg.
    """
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.agg(
        fround(F.coalesce(F.sum(q), F.lit(0.0)), 2).alias("sum_val"),
        fround(F.avg(q), 6).alias("mean_val"),
        fround(F.min(q), 2).alias("min_val"),
        fround(F.max(q), 2).alias("max_val"),
        fround(F.var_samp(q), 4).alias("variance_val"),
        fround(F.stddev_samp(q), 4).alias("std_dev_val"),
        F.count(q).alias("count_val"),
    )


@register(
    "ref_sum_nonnumeric_quirk",
    oracle=f"""
    SELECT {sql_fround("coalesce(sum(TRY_CAST(c_name AS DOUBLE)), 0.0)", 2)} AS sum_val
    FROM customer
    """,
)
def ref_sum_nonnumeric_quirk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum over a non-numeric column returns 0.0, not NULL — the reference
    skips non-numeric cells and folds from 0.0 (dataframe.rs:190-197; golden
    test `sum("Name") == Some(0.0)` dataframe.rs:1296-1297)."""
    c = t(spark, sf_dir, "customer")
    return c.agg(
        fround(
            F.coalesce(F.sum(F.col("c_name").cast("double")), F.lit(0.0)), 2
        ).alias("sum_val")
    )


@register(
    "ref_count_nonnull",
    oracle="""
    SELECT count(o_orderkey) AS n_orderkey, count(o_custkey) AS n_custkey,
           count(o_orderstatus) AS n_orderstatus, count(o_totalprice) AS n_totalprice,
           count(o_orderdate) AS n_orderdate, count(o_orderpriority) AS n_orderpriority
    FROM orders
    """,
)
def ref_count_nonnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`count()` → per-column non-null counts (dataframe.rs:354-368)."""
    o = t(spark, sf_dir, "orders")
    return o.agg(*[F.count(c).alias(f"n_{c[2:]}") for c in o.columns])


@register(
    "ref_minmax_all_columns",
    oracle=f"""
    SELECT {sql_fround('min(TRY_CAST(c_custkey AS DOUBLE))', 2)} AS min_custkey,
           {sql_fround('max(TRY_CAST(c_custkey AS DOUBLE))', 2)} AS max_custkey,
           {sql_fround('min(TRY_CAST(c_name AS DOUBLE))', 2)}    AS min_name,
           {sql_fround('max(TRY_CAST(c_name AS DOUBLE))', 2)}    AS max_name,
           {sql_fround('min(TRY_CAST(c_acctbal AS DOUBLE))', 2)} AS min_acctbal,
           {sql_fround('max(TRY_CAST(c_acctbal AS DOUBLE))', 2)} AS max_acctbal
    FROM customer
    """,
)
def ref_minmax_all_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`min()`/`max()` over ALL columns at once, numeric-coerced; a
    non-numeric column yields NULL (dataframe.rs:232-262, 321-344)."""
    c = t(spark, sf_dir, "customer")
    aggs = []
    for col in ("c_custkey", "c_name", "c_acctbal"):
        short = col[2:]
        aggs.append(fround(F.min(F.col(col).cast("double")), 2).alias(f"min_{short}"))
        aggs.append(fround(F.max(F.col(col).cast("double")), 2).alias(f"max_{short}"))
    return c.agg(*aggs)


@register(
    "ref_describe",
    oracle=f"""
    WITH vals AS (
        SELECT l_extendedprice AS v,
               row_number() OVER (ORDER BY l_extendedprice) - 1 AS rn
        FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), n AS (SELECT count(*) AS cnt FROM vals)
    SELECT (SELECT cnt FROM n)                                        AS count_val,
           {sql_fround('(SELECT avg(v) FROM vals)', 6)}               AS mean_val,
           {sql_fround('(SELECT stddev_pop(v) FROM vals)', 4)}        AS std_dev_val,
           {sql_fround('(SELECT min(v) FROM vals)', 2)}               AS min_val,
           {sql_fround('(SELECT v FROM vals, n WHERE rn = cnt // 4)', 2)}     AS q25,
           {sql_fround('(SELECT v FROM vals, n WHERE rn = cnt // 2)', 2)}     AS q50,
           {sql_fround('(SELECT v FROM vals, n WHERE rn = 3 * cnt // 4)', 2)} AS q75,
           {sql_fround('(SELECT max(v) FROM vals)', 2)}               AS max_val
    """,
)
def ref_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`describe()` with the reference's exact quirks (dataframe.rs:599-658):
    population std-dev (divides by n — inconsistent with `variance`'s n-1),
    and non-interpolated lower-index quartiles sorted[n/4], [n/2], [3n/4].

    The index-pick quartile needs a global rank: one window over the value
    column. At 100 TB one would use approx quantiles; this exact form is
    reference parity (and still single-pass + one sort-shuffle).
    """
    li = t(spark, sf_dir, "lineitem").select(F.col("l_extendedprice").alias("v")).na.drop()
    w = Window.orderBy("v")
    ranked = li.withColumn("rn", F.row_number().over(w) - 1)
    stats = li.agg(
        F.count("v").alias("count_val"),
        fround(F.avg("v"), 6).alias("mean_val"),
        fround(F.stddev_pop("v"), 4).alias("std_dev_val"),
        fround(F.min("v"), 2).alias("min_val"),
        fround(F.max("v"), 2).alias("max_val"),
    )
    picks = (
        ranked.join(stats.select("count_val"), how="cross")
        .filter(
            (F.col("rn") == F.floor(F.col("count_val") / 4))
            | (F.col("rn") == F.floor(F.col("count_val") / 2))
            | (F.col("rn") == F.floor(3 * F.col("count_val") / 4))
        )
        .groupBy()
        .agg(
            fround(F.min("v"), 2).alias("q25"),
            fround(
                F.max(F.when(F.col("rn") <= F.floor(F.col("count_val") / 2), F.col("v"))), 2
            ).alias("q50"),
            fround(F.max("v"), 2).alias("q75"),
        )
    )
    return stats.join(picks, how="cross").select(
        "count_val", "mean_val", "std_dev_val", "min_val", "q25", "q50", "q75", "max_val"
    )


# --------------------------------------------------------------------------
# Concat / null handling (reference dataframe.rs:671-744, 784-819)
# --------------------------------------------------------------------------


@register(
    "ref_concat_rows",
    oracle="""
    SELECT * FROM (
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 1
    )
    """,
)
def ref_concat_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`concat(axis=0)` → unionByName (dataframe.rs:680-717). Same column
    list both sides, vertical append."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    even = c.filter(F.col("c_custkey") % 2 == 0)
    odd = c.filter(F.col("c_custkey") % 2 == 1)
    return even.unionByName(odd)


@register(
    "ref_concat_columns",
    oracle="""
    SELECT a.c_custkey, a.c_name, b.c_acctbal, b.c_mktsegment
    FROM (SELECT c_custkey, c_name FROM customer) a
    JOIN (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer) b USING (c_custkey)
    """,
)
def ref_concat_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`concat(axis=1)` (dataframe.rs:720-744): horizontal concat = the only
    join-shaped op in the reference — rows aligned by index. Expressed as an
    equi-join on the key (broadcast-able when one side is small)."""
    c = t(spark, sf_dir, "customer")
    left = c.select("c_custkey", "c_name")
    right = c.select("c_custkey", "c_acctbal", "c_mktsegment")
    return left.join(right, "c_custkey").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )


@register(
    "ref_dropna",
    oracle="""
    SELECT c_custkey, c_name, bal FROM (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END AS c_name,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    ) WHERE c_name IS NOT NULL AND bal IS NOT NULL
    """,
)
def ref_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dropna` — drop rows with >=1 null, any-column semantics
    (dataframe.rs:784-808) → df.na.drop("any"). Nulls injected
    deterministically since testdata has none."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None).otherwise(F.col("c_name")).alias("c_name"),
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    return c.na.drop("any")


@register(
    "ref_fillna",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END AS c_name,
           coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal
    FROM customer
    """,
)
def ref_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`fillna(col, value)` — fill nulls in ONE named column only
    (dataframe.rs:811-819) → na.fill(value, subset=[col]); the other
    column's nulls stay intact."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None).otherwise(F.col("c_name")).alias("c_name"),
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    return c.na.fill(0.0, subset=["bal"])


# --------------------------------------------------------------------------
# JSON flattening at ingest (reference read.rs:143-184)
# --------------------------------------------------------------------------


@register(
    "ref_json_flatten",
    oracle="""
    SELECT event_id, event_type,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
    FROM events
    """,
)
def ref_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_json's recursive flattening (read.rs:143-184): nested keys become
    underscore-joined scalar columns — here applied to the events.props JSON
    string column via get_json_object (JVM-side JSON path, no UDF)."""
    return t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("props_k"),
    )
