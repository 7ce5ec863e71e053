"""Reference-parity ETL queries (SURVEY.md §2.1–2.3), oracle-checked.

These express the reference's extract/transform semantics as Catalyst plans
over the fixture tables: full-snapshot extract (Method-1), 30-day rolling
window extract (Method-2), ±inf→NULL cleaning, metadata-column drop, and the
retention-delete complement. The rolling-window anchor is ``max(ts)`` rather
than wall-clock now so results are deterministic (SURVEY.md §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from extract_transform_load_template_multidb_spark.catalog import load_table
from extract_transform_load_template_multidb_spark.queries import query
from extract_transform_load_template_multidb_spark.transforms import (
    clean_infinities,
    drop_meta_columns,
    window_filter,
)


@query(
    "etl_full_snapshot",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def etl_full_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-1 full-table extract: ``SELECT *`` identity projection (T1).

    Reference: ``Template-to-MySQL/BigQuery-to-MySQL-Method-1.py:56``.
    """
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


_WINDOW_ORACLE = """
SELECT event_id, ts, user_id, event_type,
       CASE WHEN isinf(value) THEN NULL ELSE value END AS value
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 30 DAY
"""


@query("etl_window_extract", oracle=_WINDOW_ORACLE)
def etl_window_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-2 incremental extract: 30-day rolling window + cleaning.

    Composition of reference S2/S4/S6/S8 (dialect-pushed ``date_trans >=
    now−30d``, e.g. ``Template-to-MySQL/BigQuery-to-MySQL-Method-2.py:58``),
    T3 (±inf→NULL, ``:58``) and T2 (metadata drop,
    ``Template-to-MySQL/Dynamics365-to-MySQL-Method-1.py:78``). The filter
    is a broadcast join against a 1-row aggregate — Catalyst keeps the scan
    distributed and prunes the ``props`` column at the parquet reader.
    """
    ev = load_table(spark, sf_dir, "events")
    ev = window_filter(ev, "ts", days=30)
    ev = clean_infinities(ev, ["value"])
    ev = drop_meta_columns(ev, ("props",))
    return ev.select("event_id", "ts", "user_id", "event_type", "value")


_RETENTION_ORACLE = """
SELECT event_id, ts, user_id, event_type
FROM events
WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 30 DAY
"""


@query("etl_retention_complement", oracle=_RETENTION_ORACLE)
def etl_retention_complement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows a Method-2 retention delete would remove (W3/W6).

    Reference: ``DELETE FROM t WHERE date_trans < DATE_SUB(CURDATE(),
    INTERVAL 30 DAY)`` (``Template-to-MySQL/BigQuery-to-MySQL-Method-2.py:77``),
    expressed as the anti-filter so it is oracle-checkable.
    """
    ev = load_table(spark, sf_dir, "events")
    cut = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 30 DAY")).alias("__cutoff")
    )
    return (
        ev.join(F.broadcast(cut), F.col("ts") < F.col("__cutoff"))
        .select("event_id", "ts", "user_id", "event_type")
    )


_INF_CLEAN_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN isinf(value) THEN 1 END) AS n_inf_cleaned,
       COUNT(CASE WHEN isnan(value) THEN 1 END) AS n_nan_kept
FROM events
GROUP BY event_type
"""


@query("etl_inf_null_clean", oracle=_INF_CLEAN_ORACLE)
def etl_inf_null_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of the ±inf→NULL rule (T3): what gets nulled, what survives.

    The reference's pandas ``replace([inf,-inf], None)`` leaves NaN alone —
    this query pins that distinction per event_type.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value").isin(float("inf"), float("-inf")), 1)).alias(
            "n_inf_cleaned"
        ),
        F.count(F.when(F.isnan("value"), 1)).alias("n_nan_kept"),
    )


_NVARCHAR_ORACLE = """
SELECT source,
       MAX(CASE WHEN regexp_matches(text, '[^a-zA-Z0-9]') THEN 1 ELSE 0 END) AS needs_nvarchar
FROM documents
GROUP BY source
"""


@query("etl_nvarchar_promotion", oracle=_NVARCHAR_ORACLE)
def etl_nvarchar_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven VARCHAR→NVARCHAR promotion scan (W10).

    Reference: sample column values, promote if any matches
    ``[^a-zA-Z0-9]`` (notebook ipynb:154,:187,:193). Expressed as a
    distributed ``rlike`` aggregate per source instead of a 1,000-row
    driver-side sample — at 100 TB the sample bound becomes a ``LIMIT``
    pushed into the scan, but the rule itself is this aggregate.
    """
    doc = load_table(spark, sf_dir, "documents")
    return doc.groupBy("source").agg(
        F.max(
            F.when(F.col("text").rlike("[^a-zA-Z0-9]"), F.lit(1)).otherwise(F.lit(0))
        ).alias("needs_nvarchar")
    )


_SINK_W7_ORACLE = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders WHERE o_orderdate < DATE '1997-01-01'
UNION ALL
SELECT o_orderkey, o_orderdate, o_totalprice * 2
FROM orders WHERE o_orderdate >= DATE '1997-01-01'
"""


@query("sink_window_overwrite_roundtrip", oracle=_SINK_W7_ORACLE)
def sink_window_overwrite_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """W7 idempotent window reload, proven by hash on the read-back: load
    the full orders table into a parquet sink, then window-overwrite the
    1997+ window with a re-extract whose prices doubled (a visible
    "corrected upstream data" stand-in), TWICE — the second run must be a
    no-op on the final state (the reference's Method-2 delete+append
    would double the window instead; ``Template-to-BigQuery/
    Dynamics365-to-BigQuery-Method-2.py:86-91`` is the idempotent form).
    Oracle: history below the cutoff unioned with the doubled window.
    """
    import tempfile

    from extract_transform_load_template_multidb_spark.sinks import (
        ParquetSink,
    )

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    cutoff = "1997-01-01"
    reextract = base.filter(
        F.col("o_orderdate") >= F.lit(cutoff).cast("date")
    ).withColumn("o_totalprice", F.col("o_totalprice") * 2)
    path = tempfile.mkdtemp(prefix="sink_w7_") + "/orders_tbl"
    sink = ParquetSink(path)
    sink.overwrite(base)
    sink.window_overwrite(reextract, "o_orderdate", cutoff, spark)
    # Idempotency: replaying the same window extract changes nothing.
    sink.window_overwrite(reextract, "o_orderdate", cutoff, spark)
    return spark.read.parquet(path)


_SCHEMA_EVOLUTION_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(NULL AS VARCHAR) AS o_orderpriority, 'v1' AS snapshot
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, 'v2'
FROM orders WHERE o_orderkey % 2 = 1
"""


@query("etl_schema_evolution_union", oracle=_SCHEMA_EVOLUTION_ORACLE)
def etl_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: an old snapshot missing a column unions
    with the new one via ``unionByName(allowMissingColumns=True)`` —
    absent columns null-fill instead of failing, the mergeSchema
    semantics an evolving landing zone needs (reference pipelines assume
    frozen schemas; a long-lived lake cannot)."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("snapshot", F.lit("v1"))
    )
    v2 = (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .withColumn("snapshot", F.lit("v2"))
    )
    return v1.unionByName(v2, allowMissingColumns=True)


_CDC_LATEST_ORACLE = """
WITH ranked AS (
    SELECT user_id, event_type, event_id, ts, value,
           row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, event_type, event_id AS last_event_id, ts AS last_ts,
       CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END
           AS last_value
FROM ranked WHERE rn = 1
"""


@query("etl_cdc_latest_state", oracle=_CDC_LATEST_ORACLE)
def etl_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: collapse an append-only change stream to the
    latest row per key — the read-side materialization every merge-on-read
    upsert sink needs (the reference's W2 upsert delegates this to MySQL's
    ``ON DUPLICATE KEY UPDATE``, reference ``Template-to-MySQL/
    PgSQL-to-MySQL-Method-1.py:77-81``; at lake scale it is a rank-1
    window). (ts, event_id) breaks update ties deterministically. One
    hash exchange on the key; at 100 TB this is the standard
    partition-local top-1 — AQE handles the skewed-key case and the
    window's rank predicate is pushed into the sort as a
    group-top-k (WindowGroupLimit) so no full per-key sort materializes."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    v = F.col("value")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.when(~F.isnan(v) & (F.abs(v) != float("inf")), v).alias(
                "last_value"
            ),
        )
    )


_MV_INCREMENTAL_ORACLE = """
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST((CASE WHEN isnan(value) OR isinf(value) THEN NULL
                           ELSE value END) AS DECIMAL(38,6)))
            AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type, CAST(ts AS DATE)
"""


@query("etl_mv_incremental_refresh", oracle=_MV_INCREMENTAL_ORACLE)
def etl_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a daily-rollup MV built
    from a historical snapshot is refreshed by merging ONLY the delta
    partition's partial aggregates (re-aggregate the union of partials —
    never rescan history). The oracle is the full-table aggregation, so
    the check proves merge(refresh(snapshot), delta) == full recompute —
    the algebraic property (count/sum are commutative monoids) that makes
    incremental view maintenance sound. Decimal-routed sums keep the
    merge order-independent. At 100 TB the snapshot side is the
    already-materialized MV (tiny vs raw events) and the delta is one
    day's partition — this query IS the cost model of a streaming MV."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    clean = F.when(~F.isnan(v) & (F.abs(v) != float("inf")), v)
    cutoff = "2024-01-20"

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(clean.cast("decimal(38,6)")).alias("sum_value_dec"),
        )

    snapshot_mv = partial(ev.where(F.col("ts") < F.lit(cutoff)))
    delta_mv = partial(ev.where(F.col("ts") >= F.lit(cutoff)))
    merged = (
        snapshot_mv.unionByName(delta_mv)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_dec").cast("double").alias("sum_value"),
        )
    )
    return merged


_DEAD_LETTER_ORACLE = """
WITH raw AS (
    SELECT event_type,
           CASE WHEN event_id % 7 = 0
                THEN substr(props, 1, length(props) - 3)
                ELSE props END AS raw
    FROM events
),
parsed AS (
    SELECT event_type,
           CASE WHEN json_valid(raw)
                THEN CAST(json_extract_string(raw, '$.k') AS BIGINT)
           END AS k
    FROM raw
)
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_good,
       CAST(COUNT(*) - COUNT(k) AS BIGINT) AS n_dead,
       CAST(SUM(k) AS BIGINT) AS sum_k_good
FROM parsed
GROUP BY event_type
"""


@query("etl_dead_letter_json", oracle=_DEAD_LETTER_ORACLE)
def etl_dead_letter_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing for semi-structured ingest: parse the JSON
    payload column against an expected schema and split good rows from
    unparseable ones instead of failing the job — the one-corrupt-record-
    must-not-kill-the-batch posture (every 7th payload is deterministically
    truncated to simulate upstream corruption; the oracle applies the
    identical mutilation). ``from_json`` is a narrow JVM map — no UDF;
    the per-type good/dead/sum rollup is one map-side-combinable
    aggregate. In production the dead rows route to a quarantine sink
    with the raw payload preserved; here the audit counts stand in."""
    ev = load_table(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 7 == 0,
        F.substring(
            F.col("props"), 1, (F.length("props") - 3).cast("int")
        ),
    ).otherwise(F.col("props"))
    k = F.from_json(raw, "k BIGINT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_good"),
            (F.count(F.lit(1)) - F.count("k")).alias("n_dead"),
            F.sum("k").alias("sum_k_good"),
        )
    )


_CDC_APPLY_ORACLE = """
WITH ranked AS (
    SELECT user_id, event_type AS op_type, event_id, ts, value,
           row_number() OVER (
               PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, event_id AS last_event_id, ts AS last_ts,
       CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END
           AS last_value
FROM ranked
WHERE rn = 1 AND op_type <> 'error'
"""


@query("etl_cdc_apply_with_deletes", oracle=_CDC_APPLY_ORACLE)
def etl_cdc_apply_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE semantics with tombstones: the change log collapses to
    the latest operation per key (rank-1 window, WindowGroupLimit), and
    keys whose LAST operation is a delete ('error' events stand in for
    tombstones) vanish from the materialized state — the
    upsert-then-maybe-delete outcome a Delta/Iceberg MERGE produces,
    computed in one pass. The delete filter applies AFTER the rank:
    earlier upserts must not resurrect a deleted key."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    v = F.col("value")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.when(~F.isnan(v) & (F.abs(v) != float("inf")), v).alias(
                "last_value"
            ),
        )
    )


_PARTITION_PLAN_ORACLE = """
SELECT CAST(o_orderdate AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CEIL(COUNT(*) / 5000.0) AS BIGINT) AS target_files,
       CAST(CEIL(CAST(COUNT(*) AS DOUBLE)
                 / CEIL(COUNT(*) / 5000.0)) AS BIGINT)
           AS rows_per_file
FROM orders
GROUP BY CAST(o_orderdate AS DATE)
"""


@query("etl_partition_planning", oracle=_PARTITION_PLAN_ORACLE)
def etl_partition_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side partition planning: per day-partition row counts and
    the file count that keeps each output file near a target size (5 000
    rows here standing in for the 128 MB rule) — the numbers a writer
    feeds into repartitionByRange before committing, and the difference
    between a healthy table and the small-files problem
    (operators/layout.py:compact_files fixes it after the fact; this
    plans it away). One aggregation; the ceil arithmetic is
    integer-exact on both engines."""
    o = load_table(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    files = F.ceil(n / 5000.0)
    return o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        n.alias("n_rows"),
        files.cast("long").alias("target_files"),
        F.ceil(n.cast("double") / files).cast("long").alias(
            "rows_per_file"
        ),
    )


_CDC_AS_OF_ORACLE = """
WITH ranked AS (
    SELECT user_id, event_type, event_id, ts, value,
           row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
    WHERE ts < TIMESTAMP '2024-01-15'
)
SELECT user_id, event_type, event_id AS last_event_id, ts AS last_ts,
       CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END
           AS last_value
FROM ranked WHERE rn = 1
"""


@query("etl_cdc_state_as_of", oracle=_CDC_AS_OF_ORACLE)
def etl_cdc_state_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel on the change log: the latest state per key AS OF a
    past instant — reconstruct what the table looked like on Jan 15
    (audit reruns, feature backfills at training-time correctness). The
    only change from etl_cdc_latest_state is the cutoff predicate, which
    pushes into the scan BEFORE the rank window — at 100 TB the
    time-travel read prunes to partitions older than the cutoff instead
    of ranking all history."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts") < F.lit("2024-01-15").cast("timestamp")
    )
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    v = F.col("value")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.when(~F.isnan(v) & (F.abs(v) != float("inf")), v).alias(
                "last_value"
            ),
        )
    )


_MERGE_PREVIEW_ORACLE = """
WITH target AS (
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
),
batch AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice * 2
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 3 = 0
),
classified AS (
    SELECT CASE
             WHEN t.o_orderkey IS NULL THEN 'insert'
             WHEN b.o_totalprice = t.o_totalprice THEN 'unchanged'
             ELSE 'update'
           END AS action
    FROM batch b LEFT JOIN target t USING (o_orderkey)
)
SELECT action, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM classified GROUP BY action
"""


@query("etl_merge_outcome_preview", oracle=_MERGE_PREVIEW_ORACLE)
def etl_merge_outcome_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dry-run MERGE: classify an incoming batch against the target as
    insert / update / unchanged BEFORE writing — the sanity gate that
    catches a mis-keyed batch (everything 'insert') or a no-op replay
    (everything 'unchanged') while the write is still abortable.
    Deterministic synthetic split: target = even keys, batch = keys
    divisible by 3 with every 4th price doubled; classification is one
    left join + CASE, the same plan MERGE itself would run."""
    o = load_table(spark, sf_dir, "orders")
    target = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.col("o_totalprice").alias("t_price")
    )
    batch = o.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 4 == 0, F.col("o_totalprice") * 2
        )
        .otherwise(F.col("o_totalprice"))
        .alias("b_price"),
    )
    classified = batch.join(target, "o_orderkey", "left").select(
        F.when(F.col("t_price").isNull(), "insert")
        .when(F.col("b_price") == F.col("t_price"), "unchanged")
        .otherwise("update")
        .alias("action")
    )
    return classified.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


_DEBOUNCE_ORACLE = """
WITH flagged AS (
    SELECT event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     > 5 * 1000000
                THEN 1 ELSE 0 END AS keep_first
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type
                 ORDER BY ts, event_id)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(keep_first) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(keep_first) AS BIGINT) AS n_debounced
FROM flagged GROUP BY event_type
"""


@query("etl_event_debounce", oracle=_DEBOUNCE_ORACLE)
def etl_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce: within each (user, type) stream, keep only
    the first event of any burst (gap > 5 s starts a new burst) — the
    double-click / retry-storm suppression every event pipeline applies
    before counting anything. One lag window per key; the audit reports
    kept vs suppressed per type (the keep-side filter is the same flag).
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    keep = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > 5 * 1_000_000
        ),
        1,
    ).otherwise(0)
    flagged = ev.select("event_type", keep.alias("keep_first"))
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("keep_first").cast("long").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("keep_first"))
        .cast("long")
        .alias("n_debounced"),
    )


_LATE_ARRIVAL_ORACLE = """
WITH arrivals AS (
    SELECT event_id, ts,
           -- synthetic processing time: every 11th event arrives one
           -- day late, every 23rd three days late
           ts + CASE WHEN event_id % 23 = 0 THEN INTERVAL 3 DAY
                     WHEN event_id % 11 = 0 THEN INTERVAL 1 DAY
                     ELSE INTERVAL 0 DAY END AS processed_at
    FROM events
),
lagged AS (
    SELECT CAST(date_trunc('day', processed_at) AS DATE) AS process_day,
           CAST(epoch_us(processed_at) - epoch_us(ts) AS BIGINT)
               AS lateness_us
    FROM arrivals
)
SELECT process_day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE lateness_us > 0) AS BIGINT)
           AS n_late,
       CAST(max(lateness_us) AS BIGINT) AS max_lateness_us
FROM lagged GROUP BY process_day
"""


@query("etl_late_arrival_profile", oracle=_LATE_ARRIVAL_ORACLE)
def etl_late_arrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arrival profile: per processing day, how many events carried
    an event time older than their arrival (and by how much) — the
    measurement that SIZES a streaming watermark (set it below the
    observed lateness tail and you drop data; above it and state lingers).
    Synthetic deterministic lateness (every 11th event +1 day, every
    23rd +3 days — the oracle applies the identical skew); the profile
    is one scalar map + one rollup."""
    ev = load_table(spark, sf_dir, "events")
    delay = (
        F.when(F.col("event_id") % 23 == 0, F.expr("INTERVAL 3 DAY"))
        .when(F.col("event_id") % 11 == 0, F.expr("INTERVAL 1 DAY"))
        .otherwise(F.expr("INTERVAL 0 DAY"))
    )
    arrivals = ev.select(
        "ts", (F.col("ts") + delay).alias("processed_at")
    )
    lagged = arrivals.select(
        F.date_trunc("day", F.col("processed_at"))
        .cast("date")
        .alias("process_day"),
        (
            F.unix_micros("processed_at") - F.unix_micros("ts")
        ).alias("lateness_us"),
    )
    return lagged.groupBy("process_day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("lateness_us") > 0, 1))
        .cast("long")
        .alias("n_late"),
        F.max("lateness_us").cast("long").alias("max_lateness_us"),
    )


_BACKFILL_PLAN_ORACLE = """
WITH present AS (
    SELECT DISTINCT epoch_us(date_trunc('hour', ts)) // 3600000000 AS h
    FROM events WHERE event_type = 'signup'
),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM present),
spine AS (
    SELECT unnest(range(lo, hi + 1)) AS h FROM bounds
),
missing AS (
    SELECT s.h FROM spine s LEFT JOIN present p USING (h)
    WHERE p.h IS NULL
),
grouped AS (
    SELECT h, h - row_number() OVER (ORDER BY h) AS grp
    FROM missing
)
SELECT make_timestamp(min(h) * 3600000000) AS gap_start,
       make_timestamp(max(h) * 3600000000) AS gap_end,
       CAST(COUNT(*) AS BIGINT) AS gap_hours
FROM grouped GROUP BY grp
"""


@query("etl_backfill_plan", oracle=_BACKFILL_PLAN_ORACLE)
def etl_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill plan: contiguous RANGES of missing signup hours (start,
    end, length) instead of a flat hour list — the unit a backfill job
    actually executes (one range = one run), built by gaps-and-islands
    over the missing-hour set from dq_missing_hours' spine technique."""
    from pyspark.sql import Window as W

    hour_us = 3_600_000_000
    ev = load_table(spark, sf_dir, "events")
    present = (
        ev.where(F.col("event_type") == "signup")
        .select(
            (
                F.unix_micros(F.date_trunc("hour", F.col("ts")))
                / hour_us
            )
            .cast("long")
            .alias("h")
        )
        .distinct()
    )
    bounds = present.agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("h")
    )
    missing = spine.join(present, "h", "left_anti")
    grouped = missing.select(
        "h",
        (F.col("h") - F.row_number().over(W.orderBy("h"))).alias(
            "grp"
        ),
    )
    return grouped.groupBy("grp").agg(
        F.timestamp_micros(F.min("h") * hour_us).alias("gap_start"),
        F.timestamp_micros(F.max("h") * hour_us).alias("gap_end"),
        F.count(F.lit(1)).alias("gap_hours"),
    ).drop("grp")


_COMPACTION_ORACLE = """
WITH files AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(COUNT(*) * 120 AS BIGINT) AS bytes
    FROM orders GROUP BY 1
),
planned AS (
    SELECT day, bytes,
           CAST(SUM(bytes) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS BIGINT) AS before_c
    FROM files
)
SELECT CAST(coalesce(before_c, 0) // 4194304 AS BIGINT) AS group_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(day) AS DATE) AS first_day,
       CAST(MAX(day) AS DATE) AS last_day
FROM planned
GROUP BY 1
"""


@query("etl_compaction_bin_packing", oracle=_COMPACTION_ORACLE)
def etl_compaction_bin_packing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Small-file compaction planner — the lakehouse maintenance job that
    keeps a 100 TB table scannable: per-partition file sizes (here the
    daily row counts × an average row width) pack into ~4 MiB target
    groups by cumulative-sum assignment (group = floor(running bytes
    BEFORE this file / target)), the deterministic next-fit policy that
    parallelizes where true first-fit's sequential free-list cannot.
    Output is the compaction manifest: per group, the file count, total
    bytes, and day range — exactly what a rewrite job consumes. One
    partial-aggregable rollup + one window running sum over the file
    list (file COUNTS, never file contents)."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as Win

    files = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg((F.count(F.lit(1)) * 120).cast("long").alias("bytes"))
    w = Win.orderBy("day").rowsBetween(Win.unboundedPreceding, -1)
    planned = files.select(
        "day",
        "bytes",
        F.coalesce(F.sum("bytes").over(w), F.lit(0))
        .cast("long")
        .alias("before_c"),
    )
    return (
        planned.groupBy(
            F.expr("before_c div 4194304").alias("group_id")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
    )


_UNPIVOT_ORACLE = """
WITH long AS (
    SELECT 'quantity' AS metric, l_quantity AS val FROM lineitem
    UNION ALL
    SELECT 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT 'tax', l_tax FROM lineitem
)
SELECT metric,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS total,
       MIN(val) AS vmin,
       MAX(val) AS vmax
FROM long GROUP BY metric
"""


@query("etl_unpivot_metrics", oracle=_UNPIVOT_ORACLE)
def etl_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt) of the lineitem measure columns via
    ``stack`` — the reshape every metrics warehouse needs going INTO a
    long-format store (the inverse of `agg_pivot_event_types`), then a
    per-metric profile over the melted rows. ``stack`` is a Catalyst
    generator (one pass, no self-union of the fact table — the naive
    UNION ALL form scans 4×, which the oracle does because SQL has no
    portable unpivot, but the ENGINE must not), and the profile
    aggregates are DECIMAL-routed."""
    li = load_table(spark, sf_dir, "lineitem")
    long_df = li.selectExpr(
        "stack(4, 'quantity', l_quantity, 'extendedprice',"
        " l_extendedprice, 'discount', l_discount, 'tax', l_tax)"
        " AS (metric, val)"
    )
    return long_df.groupBy("metric").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("val").cast("decimal(38,6)"))
        .cast("double")
        .alias("total"),
        F.min("val").alias("vmin"),
        F.max("val").alias("vmax"),
    )


_XML_ROUNDTRIP_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(md5(text)) AS min_fp,
       MAX(md5(text)) AS max_fp
FROM documents
GROUP BY source
"""


@query("etl_xml_roundtrip", oracle=_XML_ROUNDTRIP_ORACLE)
def etl_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink round trip through Spark 4's BUILT-IN xml format
    (the `rowTag` reader that subsumed spark-xml): documents are written
    as <doc> rows and read back, and the oracle aggregates prove the
    round trip is content-lossless (md5 fingerprints survive XML
    escaping of the text payload). The reference family moves data
    between five storage systems; XML is the interchange format its
    D365/OData lineage most often meets on disk. The written files
    partition like any other sink (one file per task); the read-back
    scan column-prunes through the rowTag parser. Distinct temp dir per
    call — rerun-safe."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    path = tempfile.mkdtemp(prefix="etl_xml_") + "/docs_xml"
    docs.write.mode("overwrite").format("xml").option(
        "rootTag", "docs"
    ).option("rowTag", "doc").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .load(path)
        .select(
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            # The XML reader may surface an empty-text row as null or
            # typed scalar; normalize to string exactly as written.
            F.coalesce(F.col("text").cast("string"), F.lit("")).alias(
                "text"
            ),
        )
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min(F.md5(F.col("text").cast("binary"))).alias("min_fp"),
        F.max(F.md5(F.col("text").cast("binary"))).alias("max_fp"),
    )


_PARTITIONED_PRUNING_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
           AS order_month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           AS total_price
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY 1, 2
"""


@query("etl_partitioned_write_pruning", oracle=_PARTITIONED_PRUNING_ORACLE)
def etl_partitioned_write_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write + partition-PRUNED read-back: orders
    land `partitionBy(o_orderpriority)`, and the selective read touches
    ONLY the two matching directories (PartitionFilters in the scan —
    pinned in tests/test_plans.py), never opening the other three. This
    is the layout decision that turns a 100 TB full scan into a 40 TB
    one for priority-sliced workloads — the directory-level sibling of
    the Z-order/Hilbert file-level skipping already measured in
    `layout_pruning_simulation`. The oracle computes the same aggregate
    from the unpartitioned source, proving the round trip loses
    nothing. Distinct temp dir per call — rerun-safe."""
    import tempfile

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"
    )
    path = tempfile.mkdtemp(prefix="etl_part_") + "/orders_by_priority"
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
        path
    )
    back = (
        spark.read.parquet(path)
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    )
    return back.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", F.col("o_orderdate").cast("date"))
        .cast("date")
        .alias("order_month"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_price"),
    )


_ODATA_INC_ORACLE = """
WITH feed AS (
    SELECT event_id, event_type
    FROM events
    ORDER BY event_id
    LIMIT 500
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(MIN(event_id) AS BIGINT) AS first_id,
       CAST(MAX(event_id) AS BIGINT) AS last_id
FROM feed
GROUP BY event_type
"""


@query("stream_odata_incremental", oracle=_ODATA_INC_ORACLE)
def stream_odata_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the OData CHANGE-FEED ingest — the incremental
    replacement for the reference's Method-2 30-day window re-extract
    (``Template-to-MySQL/Dynamics365-to-MySQL-Method-2.py:68-75``): a
    deterministic 500-record feed snapshot (first records in feed
    order, the position a committed ``$skip`` offset tracks) rolled up
    per entity type with the id RANGE each consumer would have
    acknowledged. The streaming half is ``format("odata_feed")``
    (sources/odata_stream.py): an offset-tracked Spark-4 Python
    streaming DataSource whose checkpointed ``$skip`` position makes
    ingestion exactly-once across restarts;
    tests/test_streaming.py::test_odata_change_feed_stream_equals_batch
    drains the SAME records through that source in multiple
    micro-batches (batch_size < feed length), applies this rollup to
    the drained sink, and requires row-for-row equality with this
    batch query — the stream==batch contract every other stream_*
    entry carries."""
    ev = load_table(spark, sf_dir, "events")
    feed = (
        ev.orderBy("event_id")
        .limit(500)
        .select("event_id", "event_type")
    )
    return feed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.min("event_id").cast("long").alias("first_id"),
        F.max("event_id").cast("long").alias("last_id"),
    )
