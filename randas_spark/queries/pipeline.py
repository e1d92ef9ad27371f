"""Pipeline-analytics layer (round 5): operators a production data
pipeline needs that no other registry module expresses, extending the
relational surface beyond SURVEY.md §2.12's checklist:

- ``rel_interval_join_binned`` — grid-binned interval-overlap join
  (range predicate → hour-grid equi-join);
- ``rel_attribution_last_touch`` — as-of attribution via an
  ignore-nulls carry-forward window (no self-join);
- ``rel_correlation_matrix`` — all pairwise corr/covar in ONE pass;
- ``rel_merge_upsert`` — CDC merge compaction (keep-latest per key,
  delete markers honored);
- ``rel_rolling_median`` — bounded-frame windowed percentile;
- ``rel_feature_binning`` — equi-depth decile assignment without a
  global sort;
- ``rel_benford_digits`` — Benford first-digit fraud/quality screen;
- ``rel_iqr_outliers`` — Tukey fences per group (robust outliers);
- ``rel_event_trigrams`` — top behavioral 3-event paths.

Every query carries a full DuckDB oracle; float outputs go through the
engine-portable fround/sql_fround pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from randas_spark.queries import fround, register, sql_fround, t

_SESS_GAP_US = 1_800_000_000  # 30-min inactivity gap, same as rel_sessionize

_SESS_ORACLE_CTE = """
    flagged AS (
        SELECT user_id, event_id, ts::TIMESTAMP AS ts,
               CASE WHEN epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP)) OVER w > 1800000000
                    OR lag(ts::TIMESTAMP) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess_rows AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS sess_id
        FROM flagged
    ), sess AS (
        SELECT user_id, sess_id, min(ts) AS sess_start, max(ts) AS sess_end
        FROM sess_rows GROUP BY user_id, sess_id
    )
"""


@register(
    "rel_interval_join_binned",
    oracle=f"""
    WITH {_SESS_ORACLE_CTE},
    busy AS (
        SELECT hr FROM (
            SELECT date_trunc('hour', ts::TIMESTAMP) AS hr, count(*) AS n
            FROM events GROUP BY 1
        ) ORDER BY n DESC, hr LIMIT 48
    )
    SELECT s.user_id, s.sess_id, b.hr AS busy_hour
    FROM sess s JOIN busy b
      ON s.sess_start < b.hr + INTERVAL 1 HOUR AND s.sess_end >= b.hr
    """,
)
def rel_interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via grid binning: which user sessions were
    live during the platform's 48 busiest hours?

    The oracle states the semantics as the naive range predicate
    (``start < hr + 1h AND end >= hr``); the Spark plan implements it as
    an EQUI-join by exploding each session into the hour-grid cells it
    spans (``sequence(trunc(start), trunc(end), 1h)``). On the hour grid
    the two are exactly equivalent (trunc(start) <= hr <= trunc(end) iff
    the interval overlaps [hr, hr+1h)), so no post-join refine or
    distinct is needed. Scale: a plain interval join is O(|sessions| x
    |windows|) (BroadcastNestedLoopJoin at best); the binned form is a
    hash join whose fan-out is bounded by session duration / grid
    granularity — the standard formulation for interval joins at 100 TB.
    Here the busy side is 48 rows → broadcast, zero shuffle beyond the
    sessionize exchange that produces the intervals."""
    from randas_spark.operators.timeseries import sessionize

    e = t(spark, sf_dir, "events")
    sess = (
        sessionize(e, _SESS_GAP_US)
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("sess_start"), F.max("ts").alias("sess_end"))
    )
    busy = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("hr"))
        .limit(48)
        .select("hr")
    )
    spanned = sess.select(
        "user_id",
        "sess_id",
        F.explode(
            F.expr(
                "sequence(date_trunc('hour', sess_start),"
                " date_trunc('hour', sess_end), interval 1 hour)"
            )
        ).alias("busy_hour"),
    )
    return spanned.join(F.broadcast(busy), spanned.busy_hour == busy.hr).select(
        "user_id", "sess_id", "busy_hour"
    )


@register(
    "rel_attribution_multitouch",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS us
        FROM events WHERE event_type IN ('click', 'view', 'purchase')
    ),
    counted AS (
        SELECT *,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   OVER w AS n_clicks,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   OVER w AS n_views
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN 259200000000 PRECEDING AND 1 PRECEDING)
    ),
    purchases AS (
        SELECT user_id,
               coalesce(n_clicks, 0) AS nc, coalesce(n_views, 0) AS nv
        FROM counted WHERE event_type = 'purchase'
    ),
    credits AS (
        SELECT user_id, 'click' AS touch_type,
               CAST(nc AS DOUBLE) / (nc + nv) AS credit,
               CASE WHEN nc > 0 THEN 1 ELSE 0 END AS hit
        FROM purchases WHERE nc + nv > 0
        UNION ALL
        SELECT user_id, 'view',
               CAST(nv AS DOUBLE) / (nc + nv),
               CASE WHEN nv > 0 THEN 1 ELSE 0 END
        FROM purchases WHERE nc + nv > 0
    )
    SELECT user_id, touch_type,
           {sql_fround('sum(credit)', 6)} AS credit,
           CAST(sum(hit) AS BIGINT) AS n_purchases
    FROM credits GROUP BY user_id, touch_type
    HAVING sum(hit) > 0
    """,
)
def rel_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click/view in the 72 h
    strictly before a purchase shares that purchase's credit equally,
    rolled up to (user, touch_type) totals — the multi-touch complement
    of rel_attribution_last_touch, answering "how much conversion
    credit do views earn that last-touch hides?".

    The touch census per purchase is a VALUE-BASED range frame
    (RANGE 72h-in-micros PRECEDING .. 1 PRECEDING) over the mixed
    per-user event stream — no touches×purchases self-join, and unlike
    a rows frame the range bound is tie-order-free (same-microsecond
    touches are all in or all out on both engines by value, never by
    sort position). One shuffle on user_id; the unpivot-to-type rollup
    runs on |purchases| rows. Same 100 TB rationale as last-touch: the
    self-join alternative shuffles events twice and skews on hot
    users."""
    lookback_us = 259_200_000_000  # 72h
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    base = e.select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-lookback_us, -1)
    )
    counted = base.select(
        "user_id",
        "event_type",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).over(w),
            F.lit(0),
        ).alias("nc"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).over(w),
            F.lit(0),
        ).alias("nv"),
    ).filter(
        (F.col("event_type") == "purchase") & (F.col("nc") + F.col("nv") > 0)
    )
    tot = (F.col("nc") + F.col("nv")).cast("double")
    credits = counted.select(
        "user_id",
        F.lit("click").alias("touch_type"),
        (F.col("nc") / tot).alias("credit"),
        F.when(F.col("nc") > 0, 1).otherwise(0).alias("hit"),
    ).unionAll(
        counted.select(
            "user_id",
            F.lit("view").alias("touch_type"),
            (F.col("nv") / tot).alias("credit"),
            F.when(F.col("nv") > 0, 1).otherwise(0).alias("hit"),
        )
    )
    return (
        credits.groupBy("user_id", "touch_type")
        .agg(
            fround(F.sum("credit"), 6).alias("credit"),
            F.sum("hit").cast("long").alias("n_purchases"),
        )
        .filter(F.col("n_purchases") > 0)
    )


@register(
    "rel_attribution_last_touch",
    oracle=f"""
    WITH scored AS (
        SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts,
               last_value(CASE WHEN event_type IN ('click','view')
                               THEN event_id END IGNORE NULLS) OVER w AS touch_event_id,
               last_value(CASE WHEN event_type IN ('click','view')
                               THEN event_type END IGNORE NULLS) OVER w AS touch_type,
               last_value(CASE WHEN event_type IN ('click','view')
                               THEN epoch_us(ts::TIMESTAMP) END IGNORE NULLS) OVER w AS touch_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id AS purchase_event_id, ts AS purchase_ts,
           CASE WHEN epoch_us(ts) - touch_us <= 259200000000
                THEN touch_event_id END AS touch_event_id,
           CASE WHEN epoch_us(ts) - touch_us <= 259200000000
                THEN touch_type END AS touch_type,
           CASE WHEN epoch_us(ts) - touch_us <= 259200000000
                THEN {sql_fround('(epoch_us(ts) - touch_us) / 60000000.0', 3)}
           END AS mins_since_touch
    FROM scored WHERE event_type = 'purchase'
    """,
)
def rel_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent STRICTLY PRECEDING click/view within a 72-hour lookback;
    purchases with no in-window touch keep NULL attribution columns.

    Expressed as one ignore-nulls ``last()`` carry-forward window over
    the mixed event stream — the as-of-join-free formulation: no
    touches-vs-conversions self-join, one shuffle on user_id, constant
    per-row state, and the frame ends at ``-1 PRECEDING`` so a purchase
    sharing a timestamp tie is broken by event_id exactly as the oracle
    does. At 100 TB this is the shape that survives: the self-join
    alternative shuffles the events table twice and skews on hot users.
    The lookback guard is integer microsecond arithmetic on both engines
    (no float drift); minutes are divided out as doubles and rounded via
    the portable fround pair."""
    lookback_us = 259_200_000_000  # 72h
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    scored = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("touch_event_id0"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type0"),
        F.last(F.when(is_touch, F.unix_micros(F.col("ts"))), ignorenulls=True)
        .over(w)
        .alias("touch_us"),
    ).filter(F.col("event_type") == "purchase")
    in_window = (F.unix_micros(F.col("ts")) - F.col("touch_us")) <= lookback_us
    mins = (F.unix_micros(F.col("ts")) - F.col("touch_us")) / F.lit(60_000_000.0)
    return scored.select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
        F.when(in_window, F.col("touch_event_id0")).alias("touch_event_id"),
        F.when(in_window, F.col("touch_type0")).alias("touch_type"),
        F.when(in_window, fround(mins, 3)).alias("mins_since_touch"),
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CORR_PAIRS = [
    (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
]

_CORR_ORACLE_ROWS = " UNION ALL ".join(
    f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
    f"{sql_fround(f'corr({a}, {b})', 6)} AS corr, "
    f"{sql_fround(f'covar_samp({a}, {b})', 6)} AS covar "
    f"FROM agg_src"
    for a, b in _CORR_PAIRS
)


@register(
    "rel_correlation_matrix",
    oracle=f"""
    WITH agg_src AS (SELECT l_quantity, l_extendedprice, l_discount, l_tax
                     FROM lineitem)
    {_CORR_ORACLE_ROWS}
    """,
)
def rel_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation + sample covariance over the four
    lineitem measures, long format (col_a, col_b, corr, covar).

    ONE aggregation pass computes all 12 statistics (6 pairs x 2) as
    map-side-combinable moments — a single scan + a 1-row shuffle — then
    a stack() unpivots driver-light to long form. The naive alternative
    (one job per pair, or worse ``df.stat.corr`` in a loop) scans the
    fact table 6 times. Pruned scan: only the 4 measure columns are
    read. corr/covar accumulate identically (Welford-style merge) on
    both engines; fround(6) absorbs the summation-order ulp."""
    li = t(spark, sf_dir, "lineitem").select(*_CORR_COLS)
    aggs = []
    for a, b in _CORR_PAIRS:
        aggs.append(fround(F.corr(a, b), 6).alias(f"corr__{a}__{b}"))
        aggs.append(fround(F.covar_samp(a, b), 6).alias(f"covar__{a}__{b}"))
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', corr__{a}__{b}, covar__{a}__{b}" for a, b in _CORR_PAIRS
    )
    return wide.select(
        F.expr(
            f"stack({len(_CORR_PAIRS)}, {stack_args}) AS (col_a, col_b, corr, covar)"
        )
    )


import math as _math

_BENFORD = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}
# CAST each literal: bare 16-digit decimals type as DECIMAL in DuckDB
_BENFORD_SQL = "CASE digit " + " ".join(
    f"WHEN '{d}' THEN CAST({_BENFORD[d]!r} AS DOUBLE)" for d in range(1, 10)
) + " END"


@register(
    "rel_benford_digits",
    oracle=f"""
    WITH d AS (
        SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit
        FROM orders WHERE o_totalprice >= 1
    ), c AS (
        SELECT digit, count(*) AS n FROM d GROUP BY digit
    )
    SELECT digit, n,
           {sql_fround('CAST(n AS DOUBLE) / (SELECT sum(n) FROM c)', 6)} AS frac,
           {sql_fround(_BENFORD_SQL, 6)} AS benford_expected,
           {sql_fround(f'abs(CAST(n AS DOUBLE) / (SELECT sum(n) FROM c) - ({_BENFORD_SQL}))', 6)} AS abs_dev
    FROM c
    """,
)
def rel_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit: the observed leading-digit
    distribution of order totals against Benford's law — the classic
    fabricated-data / fraud screen, and a data-quality primitive for
    any monetary column. Digit extraction is INTEGER-SAFE (first char
    of the floored value's integer string — identical on both engines),
    never floor(log10(x)), whose libm ulp flips at exact powers of ten.
    One pruned scan + a 9-row aggregate; the total is a 1-row broadcast
    subquery. (TPC-H synthetic prices are uniform-ish, so deviations
    here are LARGE — the query reports the screen, not a verdict.)"""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    c = (
        o.select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # total as a window over the 9-row aggregate: the agg+crossJoin
    # form re-executed the whole digit-count lineage (second full scan
    # of orders) for one scalar already derivable from the result
    tot = F.sum("n").over(Window.partitionBy())
    expected = F.when(F.col("digit") == "1", F.lit(_BENFORD[1]))
    for d in range(2, 10):
        expected = expected.when(F.col("digit") == str(d), F.lit(_BENFORD[d]))
    frac = F.col("n").cast("double") / tot
    return c.select(
        "digit",
        "n",
        fround(frac, 6).alias("frac"),
        fround(expected, 6).alias("benford_expected"),
        fround(F.abs(frac - expected), 6).alias("abs_dev"),
    )


_BIN_QS = ", ".join(str(q / 10) for q in range(1, 10))


@register(
    "rel_feature_binning",
    oracle=f"""
    WITH b AS (
        SELECT list_transform(quantile_cont(o_totalprice, [{_BIN_QS}]),
                              x -> {sql_fround('x', 6)}) AS bnds
        FROM orders
    )
    SELECT o_orderkey, o_totalprice,
           CAST(len(list_filter(b.bnds, bd -> o_totalprice >= bd)) AS BIGINT) AS bucket
    FROM orders, b
    """,
)
def rel_feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth feature binning: every order assigned its o_totalprice
    DECILE — the feature-engineering discretization step. The
    scale-correct shape: ONE aggregation computes the 9 boundary values
    (exact interpolated percentile here for the oracle; production swaps
    in the mergeable approx_percentile/quantile sketch), broadcast back
    as a 9-element array, and bucket = count of boundaries <= value (a
    codegen HOF per row) — never ntile() over a global ORDER BY, which
    funnels 100 TB through one sort partition. Boundaries are
    fround(6)-quantized on BOTH engines before comparison, so borderline
    rows bucket identically despite percentile-interpolation ulp."""
    o = t(spark, sf_dir, "orders")
    b = o.agg(
        F.expr(f"percentile(o_totalprice, array({_BIN_QS}))").alias("bnds0")
    ).select(F.transform(F.col("bnds0"), lambda x: fround(x, 6)).alias("bnds"))
    return o.crossJoin(F.broadcast(b)).select(
        "o_orderkey",
        "o_totalprice",
        F.size(
            F.filter(F.col("bnds"), lambda bd: F.col("o_totalprice") >= bd)
        )
        .cast("long")
        .alias("bucket"),
    )


@register(
    "rel_rolling_median",
    oracle=f"""
    WITH ev AS (
        SELECT * FROM events WHERE value IS NOT NULL
    ), w AS (
        SELECT user_id, event_id, value,
               list_sort(list(value) OVER win) AS s,
               CAST(len(list(value) OVER win) AS BIGINT) AS n
        FROM ev
        WINDOW win AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
                       ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, value,
           {sql_fround('(s[CAST((n + 1) // 2 AS BIGINT)] + s[CAST(n // 2 + 1 AS BIGINT)]) / 2.0', 6)} AS rolling_median
    FROM w
    """,
)
def rel_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median of each user's trailing 11 events — the robust
    smoother rolling averages can't give you (one outlier moves a mean,
    not a median). No built-in windowed percentile exists on either
    engine, so both run the identical explicit form: collect the frame
    into an array (bounded at 11 elements — constant per-row state, the
    reason this is safe), sort, pick the middle (mean of the two middle
    elements on even counts). One shuffle on user_id, same window
    family as rel_anomaly_zscore. At 100 TB the frame bound is the
    contract: rolling-collect is only legal with a ROWS frame of
    constant width."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-10, Window.currentRow)
    )
    # value IS NOT NULL pinned on BOTH sides: Spark's collect_list
    # DROPS nulls while DuckDB's list() keeps them — with any null in a
    # frame the two sides would pick different middle elements. The
    # filter makes the invariant explicit instead of fixture-dependent.
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = F.array_sort(F.collect_list("value").over(w))
    n = F.size(s)
    staged = e.select(
        "user_id", "event_id", "value", s.alias("s"), n.alias("n")
    )
    med = (
        F.element_at(F.col("s"), ((F.col("n") + 1) / 2).cast("int"))
        + F.element_at(F.col("s"), (F.col("n") / 2).cast("int") + 1)
    ) / F.lit(2.0)
    return staged.select(
        "user_id", "event_id", "value", fround(med, 6).alias("rolling_median")
    )


@register(
    "rel_merge_upsert",
    oracle="""
    SELECT user_id, ts::TIMESTAMP AS last_ts, event_type AS last_op,
           value AS last_value,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
      AND event_type <> 'error'
    """,
)
def rel_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge compaction (MERGE INTO semantics without a table
    format): the event stream is a change feed keyed by user_id, ordered
    by (ts, event_id); the latest op wins, and a key whose latest op is
    the delete marker ('error') vanishes from the compacted state.
    Non-latest deletes are correctly ignored.

    One window over one shuffle on the merge key: row_number picks the
    survivor, a count over the same partition audits op volume (the
    exchange is reused — one Exchange in the plan). This is the
    compaction kernel under every upsert table format; at 100 TB the
    feed is bucketed by key at ingest so the shuffle disappears
    entirely (io/layout.write_bucketed demonstrates the layout)."""
    e = t(spark, sf_dir, "events")
    wk = Window.partitionBy("user_id")
    w = wk.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_op"),
            F.col("value").alias("last_value"),
            F.count(F.lit(1)).over(wk).alias("n_ops"),
            F.row_number().over(w).alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("last_op") != "error"))
        .drop("rn")
    )


@register(
    "rel_iqr_outliers",
    oracle=f"""
    WITH fences AS (
        SELECT l_returnflag,
               {sql_fround('quantile_cont(l_extendedprice, 0.25)', 6)} AS q1,
               {sql_fround('quantile_cont(l_extendedprice, 0.75)', 6)} AS q3
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber, l.l_extendedprice,
           (l.l_extendedprice > f.q3 + 1.5 * (f.q3 - f.q1)) AS high_outlier
    FROM lineitem l JOIN fences f USING (l_returnflag)
    WHERE l.l_extendedprice > f.q3 + 1.5 * (f.q3 - f.q1)
       OR l.l_extendedprice < f.q1 - 1.5 * (f.q3 - f.q1)
    """,
)
def rel_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outliers per group: line items outside the
    [Q1 − 1.5·IQR, Q3 + 1.5·IQR] fences of their returnflag's price
    distribution — the grouped ROBUST outlier primitive (quartiles
    don't move with the outliers they're fencing, unlike the z-score
    family's mean/std). Scale shape mirrors rel_feature_binning: one
    exact-percentile aggregate per group (approx_percentile in
    production), the 3-row fence table broadcast back into the scan,
    never a window over the whole fact. Fences are fround(6)-quantized
    on both engines so borderline rows compare identically."""
    li = t(spark, sf_dir, "lineitem")
    fences = li.groupBy("l_returnflag").agg(
        fround(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("q1"),
        fround(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    hi, lo = F.col("q3") + 1.5 * iqr, F.col("q1") - 1.5 * iqr
    return (
        li.join(F.broadcast(fences), "l_returnflag")
        .filter((F.col("l_extendedprice") > hi) | (F.col("l_extendedprice") < lo))
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            (F.col("l_extendedprice") > hi).alias("high_outlier"),
        )
    )


@register(
    "rel_event_trigrams",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
    )
    SELECT event_type AS e1, e2, e3, count(*) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 10
    """,
)
def rel_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 behavioral TRIGRAM paths: the most common 3-event
    sequences across user journeys — one step up from the Markov
    bigrams of rel_event_transitions (trigrams expose patterns
    first-order transitions wash out, e.g. view→click→purchase vs
    click→view→purchase). Two lead() columns over one user_id window
    (single shuffle + sort, both leads share the frame), then a
    map-side-combinable count and a TakeOrdered top-10 with full
    tiebreak."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    e = t(spark, sf_dir, "events")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(10)
    )


@register(
    "rel_table_diff",
    oracle="""
    WITH v_old AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 11 <> 0
    ),
    v_new AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 10.0 ELSE c_acctbal END AS c_acctbal
        FROM customer WHERE c_custkey % 13 <> 0
    )
    SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'added'
                WHEN n.c_custkey IS NULL THEN 'removed'
                ELSE 'changed' END AS status
    FROM v_old o FULL JOIN v_new n USING (c_custkey)
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_name <> n.c_name OR o.c_acctbal <> n.c_acctbal
    """,
)
def rel_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table reconciliation (data-diff): added / removed / changed keys
    between two dimension versions (synthesized deterministic v_old /
    v_new of the customer table) — the audit primitive behind every
    migration sign-off and CDC-vs-batch backfill check. One full outer
    join on the key comparing value columns; unchanged rows never leave
    the join. At 100 TB both versions are bucketed on the key
    (io/layout.write_bucketed) so the diff is Exchange-free; comparing
    a column-hash instead of each column cuts the compare width for
    wide tables (rel_table_checksum's md5 recipe)."""
    c = t(spark, sf_dir, "customer")
    v_old = c.filter(F.col("c_custkey") % 11 != 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    v_new = c.filter(F.col("c_custkey") % 13 != 0).select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 10.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    o, n = v_old.alias("o"), v_new.alias("n")
    joined = o.join(n, F.col("o.c_custkey") == F.col("n.c_custkey"), "full")
    status = (
        F.when(F.col("o.c_custkey").isNull(), F.lit("added"))
        .when(F.col("n.c_custkey").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return joined.filter(
        F.col("o.c_custkey").isNull()
        | F.col("n.c_custkey").isNull()
        | (F.col("o.c_name") != F.col("n.c_name"))
        | (F.col("o.c_acctbal") != F.col("n.c_acctbal"))
    ).select(
        F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey")).alias("c_custkey"),
        status.alias("status"),
    )


@register(
    "rel_cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, CAST(min(date_trunc('day', ts::TIMESTAMP)) AS DATE) AS d
        FROM events GROUP BY user_id
    ),
    daily AS (SELECT d, count(*) AS n_new FROM first_seen GROUP BY d)
    SELECT d, n_new,
           CAST(sum(n_new) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM daily
    """,
)
def rel_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve metric.
    The trick that makes it cheap: cumulative COUNT DISTINCT never
    needs distinct-over-a-window (quadratic state) — each user
    contributes exactly once, at their FIRST-SEEN day, so one
    groupBy(user) min, one daily count, and a running sum over the
    (tiny) day series give the exact curve. At 100 TB the only
    full-data pass is the first-seen aggregation (map-side
    combinable); everything after runs on |days| rows."""
    e = t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).cast("date").alias("d")
    )
    daily = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "d", "n_new", F.sum("n_new").over(w).cast("long").alias("cumulative_users")
    )


@register(
    "rel_pareto_revenue",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey, {sql_fround('sum(o_totalprice)', 2)} AS revenue
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, revenue,
           {sql_fround('''sum(revenue) OVER (ORDER BY revenue DESC, o_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / sum(revenue) OVER (ORDER BY revenue DESC, o_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)''', 6)}
               AS cum_share,
           {sql_fround('''sum(revenue) OVER (ORDER BY revenue DESC, o_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / sum(revenue) OVER (ORDER BY revenue DESC, o_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)''', 6)} <= 0.8
               AS in_top80
    FROM rev
    """,
)
def rel_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / revenue-concentration curve: customers ranked by spend
    with their cumulative revenue share and an 80%-band flag — the
    concentration diagnostic behind key-account analysis and the 80/20
    sanity check. Scale discipline: the fact-scale work is ONE
    map-side-combinable per-customer aggregate; the global-order window
    runs on the customer ROLLUP (dimension-sized — bounded by
    |customers|, never fact rows), which is the only place a global
    ORDER BY is acceptable. Per-customer revenue is fround(2)-quantized
    BEFORE the cumulative sums, and both the running and total sums are
    windows over the same explicit order, so the float sequences are
    identical on both engines."""
    o = t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        fround(F.sum("o_totalprice"), 2).alias("revenue")
    )
    order = [F.col("revenue").desc(), F.col("o_custkey")]
    w_run = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    share = F.sum("revenue").over(w_run) / F.sum("revenue").over(w_all)
    return rev.select(
        "o_custkey",
        "revenue",
        fround(share, 6).alias("cum_share"),
        (fround(share, 6) <= 0.8).alias("in_top80"),
    )


@register(
    "rel_weekday_hour_profile",
    oracle=f"""
    SELECT CAST(isodow(ts::TIMESTAMP) AS BIGINT) AS iso_dow,
           CAST(hour(ts::TIMESTAMP) AS BIGINT) AS hr,
           count(*) AS n_events,
           {sql_fround('avg(value)', 6)} AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def rel_weekday_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity profile (the seasonality heatmap): event
    volume and mean value per ISO weekday and hour-of-day — the shape
    behind traffic forecasting, capacity planning, and anomaly
    baselines. ONE map-side-combinable aggregate to 168 cells; derived
    grouping keys cost nothing at any scale. Cross-engine day-of-week
    is a real trap pinned here: Spark's dayofweek() is Sunday=1 while
    DuckDB's is Sunday=0, so both sides use the ISO convention —
    Spark weekday()+1 == DuckDB isodow() (Monday=1)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy(
        (F.weekday(F.col("ts")) + 1).cast("long").alias("iso_dow"),
        F.hour(F.col("ts")).cast("long").alias("hr"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        fround(F.avg("value"), 6).alias("avg_value"),
    )


@register(
    "rel_anomaly_mad",
    oracle=f"""
    WITH med AS (
        SELECT event_type,
               {sql_fround('quantile_cont(value, 0.5)', 6)} AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type,
               {sql_fround('quantile_cont(abs(e.value - m.med), 0.5)', 6)} AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    )
    SELECT e.event_type, e.event_id, e.value,
           {sql_fround('0.6745 * (e.value - m.med) / d.mad', 4)} AS modified_z
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE abs(0.6745 * (e.value - m.med) / d.mad) > 3.5
    """,
)
def rel_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via the median-absolute-deviation
    modified z-score (Iglewicz–Hoaglin |0.6745·(x−med)/MAD| > 3.5) over
    each event type's heavy-tailed value distribution: the
    breakdown-point-0.5 sibling of rel_anomaly_zscore (whose mean/std
    move with the very outliers being fenced) and the distribution-free
    sibling of rel_iqr_outliers. Two exact-percentile aggregates per
    group (median, then median of |x − med|), each a tiny per-group
    table broadcast back into the scan — never a window over the whole
    fact; at 100 TB the percentiles swap to approx_percentile with the
    same plan shape. Med/MAD are fround(6)-quantized on BOTH engines
    before the fence comparison (the rel_iqr_outliers discipline), so
    borderline rows classify identically."""
    e = t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        fround(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        fround(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad")
    )
    z = 0.6745 * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(z) > 3.5)
        .select(
            "event_type",
            "event_id",
            "value",
            fround(z, 4).alias("modified_z"),
        )
    )


@register(
    "rel_rolling_slope",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(floor(epoch(ts::TIMESTAMP) / 3600) AS BIGINT) AS hx,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS hy
        FROM events GROUP BY 1, 2
    ),
    win AS (
        SELECT event_type, hx, hy,
               count(*)    OVER w AS n,
               sum(hx)     OVER w AS sx,
               sum(hy)     OVER w AS sy,
               sum(hx * hy) OVER w AS sxy,
               sum(hx * hx) OVER w AS sxx
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hx
                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           CAST(to_timestamp(hx * 3600) AS TIMESTAMP) AS hour_start,
           {sql_fround('CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)', 6)} AS slope
    FROM win WHERE n = 24
    """,
)
def rel_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-hour ROLLING OLS slope of hourly activity value per event
    type — the rolling-beta/trend primitive (is this series heating up
    RIGHT NOW?), the windowed sibling of the global closed-form fits in
    operators/regression.py. Every window statistic (n, Σx, Σy, Σxy,
    Σx²) is an EXACT integer window sum over the scaled series (the
    cents-quantized hourly totals and epoch-hour indices), so the slope
    numerator/denominator are bit-identical across engines before the
    single double division. Emitted only for full 24-point windows.

    Scale: one hourly compaction (the only data-sized stage), then five
    integer window sums over one sorted pass per series — no self-join,
    no per-window rescan; the same shape at 100 TB with the compaction
    carrying the weight. Integer budget: n·Σxy and Σx·Σy peak ~1e14-1e15
    at epoch-hour magnitudes — four orders under int64."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    hx = F.floor(F.unix_seconds(F.col("ts")) / 3600).cast("long")
    vy = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hourly = (
        e.select(F.col("event_type"), hx.alias("hx"), vy.alias("vy"))
        .groupBy("event_type", "hx")
        .agg(F.sum("vy").alias("hy"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hx")
        .rowsBetween(-23, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("hx").over(w)
    sy = F.sum("hy").over(w)
    sxy = F.sum(F.col("hx") * F.col("hy")).over(w)
    sxx = F.sum(F.col("hx") * F.col("hx")).over(w)
    slope = (n * sxy - sx * sy).cast("double") / (n * sxx - sx * sx).cast("double")
    return (
        hourly.select(
            "event_type",
            F.timestamp_seconds(F.col("hx") * 3600).alias("hour_start"),
            slope.alias("__slope__"),
            n.alias("__n__"),
        )
        .filter(F.col("__n__") == 24)
        .select(
            "event_type", "hour_start", fround(F.col("__slope__"), 6).alias("slope")
        )
    )
