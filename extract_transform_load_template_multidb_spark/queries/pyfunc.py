"""Arrow-batched Python UDF surface: pandas_udf and applyInPandas demos.

The engine's rule is built-ins first (every other query in this package is
pure JVM); these two queries exist to pin the SANCTIONED Python escape
hatch — Arrow-batched ``pandas_udf`` / ``applyInPandas``, never
row-at-a-time ``udf`` — with the same oracle-hash correctness bar as the
JVM operators. Both are designed for bit-exact cross-engine math so the
DuckDB oracle hash-matches despite the Python hop:

- the vector norm works in the quantized-integer domain (exact int64
  sums, one final sqrt), the same trick :mod:`..operators.similarity`
  uses for cosine;
- the grouped median is an order statistic (no accumulation), so pandas
  and DuckDB produce the identical double.

Reference parity note: the reference's pandas usage is row-format
conversion inside Airflow tasks (e.g. ``Template-to-MySQL/
BigQuery-to-MySQL-Method-1.py`` fetch→DataFrame→executemany); this is the
Spark-native analogue — pandas at the executor edge, Arrow on the wire,
plan stays distributed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from extract_transform_load_template_multidb_spark.catalog import load_table
from extract_transform_load_template_multidb_spark.queries import query

_NORM_ORACLE = """
SELECT vec_id,
       CAST(SQRT(CAST(list_sum(
           list_transform(embedding,
                          x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                               * CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))
       ) AS DOUBLE)) AS DOUBLE) / 1000.0 AS l2_norm
FROM embeddings
"""


@query("pyfunc_vec_l2_norm", oracle=_NORM_ORACLE)
def pyfunc_vec_l2_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm of each embedding via an Arrow-batched scalar pandas_udf.

    numpy does the math per Arrow batch (vectorized, ~10-100× the
    row-at-a-time ``udf`` path); quantizing to int64 first makes the sum
    exact, so numpy's reassociated summation cannot drift from DuckDB's
    sequential ``list_sum`` — the one final ``sqrt`` is the same IEEE op
    in both engines. At 100 TB this is a narrow map: no shuffle, Arrow
    batch size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """
    import numpy as np

    @pandas_udf("double")
    def l2_quant(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            q = np.floor(np.asarray(v, dtype=np.float64) * 1000.0).astype(
                np.int64
            )
            out.append(float(np.sqrt(float((q * q).sum()))) / 1000.0)
        return pd.Series(out, dtype="float64")

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", l2_quant(F.col("embedding")).alias("l2_norm"))


_MEDIAN_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       median(value) AS median_value,
       CAST(min(value) AS DOUBLE) AS min_value,
       CAST(max(value) AS DOUBLE) AS max_value
FROM events GROUP BY event_type
"""


@query("pyfunc_grouped_median", oracle=_MEDIAN_ORACLE)
def pyfunc_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exact median via ``applyInPandas`` (grouped-map UDAF
    shape: whole group → pandas frame → one summary row).

    The median is an order statistic — sort + pick (plus one midpoint
    average for even counts, the identical IEEE op in pandas and DuckDB) —
    so no float accumulation can drift. SCALE HONESTY: groupBy(low-card
    key).applyInPandas materializes each group in one executor's memory;
    that is the right tool for many medium groups (per-tenant, per-day
    stats), and the wrong one for 5 groups × 20 TB — there you shard the
    key (salt + merge of sorted runs) or accept ``approx_percentile``.
    This query pins the exact-UDAF surface at oracle scale.
    """

    def _summary(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf["value"]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "median_value": [float(vals.median())],
                "min_value": [float(vals.min())],
                "max_value": [float(vals.max())],
            }
        )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        _summary,
        "event_type string, n bigint, median_value double, "
        "min_value double, max_value double",
    )


_UDTF_CHUNK_ORACLE = """
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       substr(text, CAST(i * 64 + 1 AS BIGINT), 64) AS chunk,
       CAST(length(substr(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS INT)
           AS n_chars
FROM documents,
     unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) u(i)
WHERE length(text) > 0
"""


@query("pyfunc_udtf_chunks", oracle=_UDTF_CHUNK_ORACLE)
def pyfunc_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 3.5+/4 ``@udtf``): a table function
    that explodes each document into fixed-width character chunks via
    ``LATERAL`` join — the row→rows escape hatch when the expansion
    logic is genuinely procedural. This chunker is deliberately also
    expressible as a JVM ``sequence``+``substring`` expression (which is
    what ``operators.curation.chunk_documents`` does, and what the
    oracle runs) — the point pinned here is the UDTF API contract and
    its exact parity with the built-in path, not a recommendation to
    route hot-path chunking through Python."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "chunk_idx int, chunk string, n_chars int"
    ))
    class CharChunker:
        def eval(self, text: str, size: int):
            if not text:
                return
            for i in range(0, len(text), size):
                piece = text[i : i + size]
                yield i // size, piece, len(piece)

    spark.udtf.register("char_chunker", CharChunker)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_chars "
        "FROM _udtf_docs d, LATERAL char_chunker(d.text, 64) c"
    )


_COGROUP_ORACLE = """
WITH e AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(max(ts) AS DATE) AS last_event_day
    FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
o AS (
    SELECT o_custkey AS user_id, CAST(COUNT(*) AS BIGINT) AS n_orders,
           max(CAST(o_orderdate AS DATE)) AS last_order_day
    FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
)
SELECT COALESCE(e.user_id, o.user_id) AS user_id,
       COALESCE(e.n_events, 0) AS n_events,
       COALESCE(o.n_orders, 0) AS n_orders,
       CASE WHEN e.user_id IS NOT NULL AND o.user_id IS NOT NULL
            THEN date_diff('day', o.last_order_day, e.last_event_day)
       END AS event_after_order_days
FROM e FULL OUTER JOIN o ON o.user_id = e.user_id
"""


_PROFILE_COLS = ["user_id", "n_events", "n_orders", "event_after_order_days"]


def _bucketed_profile(
    events_pdf: pd.DataFrame, orders_pdf: pd.DataFrame
) -> pd.DataFrame:
    """Vectorized per-bucket body of pyfunc_cogrouped_user_profile: a
    pandas groupby per side + one outer merge computes every user in
    the bucket in one interpreter crossing. Module-level so
    tests/test_properties.py pins THIS code against a naive per-user
    reference, not a copy. Assumes NULL-free user_id (the query filters
    both sides — pandas merges NaN keys to each other, SQL's equi-join
    does not, so NULL keys must never reach this body)."""
    import numpy as np

    e = events_pdf.groupby("user_id", as_index=False).agg(
        n_events=("ts", "size"), last_e=("ts", "max")
    )
    o = orders_pdf.groupby("user_id", as_index=False).agg(
        n_orders=("o_orderdate", "size"),
        last_o=("o_orderdate", "max"),
    )
    m = e.merge(o, on="user_id", how="outer")
    m["n_events"] = m["n_events"].fillna(0).astype("int64")
    m["n_orders"] = m["n_orders"].fillna(0).astype("int64")
    both = m["last_e"].notna() & m["last_o"].notna()
    lag = pd.array([pd.NA] * len(m), dtype="Int32")
    if both.any():
        de = pd.to_datetime(m.loc[both, "last_e"]).values.astype(
            "datetime64[D]"
        )
        do = pd.to_datetime(m.loc[both, "last_o"]).values.astype(
            "datetime64[D]"
        )
        lag[np.asarray(both)] = (de - do).astype("int64").astype("int32")
    m["event_after_order_days"] = lag
    m["user_id"] = m["user_id"].astype("int64")
    return m[_PROFILE_COLS]


@query("pyfunc_cogrouped_user_profile", oracle=_COGROUP_ORACLE)
def pyfunc_cogrouped_user_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cogrouped ``applyInPandas`` (the two-table grouped-map shape):
    each cogroup call receives matching slices of the event stream and
    the order history and emits per-user profiles — counts and the day
    lag between last order and last event. The pandas body computes
    only counts, order statistics, and integer day arithmetic, so the
    result is exactly the full-outer-join aggregate the oracle runs.
    SCALE: cogrouping directly on ``user_id`` costs one Python call per
    user (~0.3 ms each — measured 18 s for 60k users at sf0.1, and
    linear in user count from there), so the cogroup key is a HASH
    BUCKET of the entity id: both sides shuffle once by
    ``pmod(xxhash64(user_id), 64)``, each call gets every row for all
    users in one bucket, and a vectorized pandas ``groupby``/``merge``
    inside the call (:func:`_bucketed_profile`) does the per-user math.
    Same output, ~1000× fewer interpreter crossings — the shape a
    100 TB per-entity backfill actually uses (Python cost scales with
    buckets, not entities). NULL keys are filtered on BOTH the Spark
    side and the oracle: pandas' merge matches NaN join keys to each
    other while SQL's equi-join does not, so letting NULLs through
    would diverge the engines (none exist in the fixtures — this pins
    the contract). For purely relational profiles like this one the
    JVM join is the production path, which is the parity being
    pinned."""
    n_buckets = 64
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)).cast("int")
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts")
        .filter(F.col("user_id").isNotNull())
        .withColumn("bucket", bucket)
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .filter(F.col("user_id").isNotNull())
        .withColumn("bucket", bucket)
    )
    return (
        ev.groupBy("bucket")
        .cogroup(orders.groupBy("bucket"))
        .applyInPandas(
            _bucketed_profile,
            "user_id bigint, n_events bigint, n_orders bigint, "
            "event_after_order_days int",
        )
    )


_MINMAX_ORACLE = """
WITH clean AS (
    SELECT event_id, value AS v FROM events
    WHERE NOT isnan(value) AND isfinite(value)
),
b AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM clean)
SELECT c.event_id,
       round((c.v - b.lo) / (b.hi - b.lo), 6) AS scaled
FROM clean c CROSS JOIN b
"""


@query("pyfunc_mapinpandas_minmax", oracle=_MINMAX_ORACLE)
def pyfunc_mapinpandas_minmax(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Min-max scaling of ``events.value`` through ``mapInPandas`` — the
    remaining Arrow escape-hatch API this family pins (scalar
    pandas_udf, applyInPandas, UDTF and cogroup are covered by the
    other four). The global bounds come from a 1-row JVM aggregate
    broadcast onto the stream BEFORE the Python hop, so the map stays
    narrow (no state in Python, batches independent) and the arithmetic
    — one subtract, one divide per value — is the same IEEE double op
    in numpy, Spark SQL and DuckDB: bit-identical without quantization.
    At scale this is the canonical feature-scaling pass: one bounds
    aggregate + one Arrow-batched narrow map."""
    from collections.abc import Iterator

    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    clean = ev.where(
        ~F.isnan(v) & ~v.isin(float("inf"), float("-inf"))
    ).select("event_id", v.alias("v"))
    bounds = clean.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    withb = clean.crossJoin(F.broadcast(bounds))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "scaled": (pdf["v"] - pdf["lo"])
                    / (pdf["hi"] - pdf["lo"]),
                }
            )
            yield out

    # Quantize JVM-side, not in pandas: numpy's round is half-to-even
    # while Spark/DuckDB round half-away — same raw IEEE value in, same
    # rounding rule out.
    return withb.mapInPandas(
        fn, "event_id bigint, scaled double"
    ).select("event_id", F.round("scaled", 6).alias("scaled"))


_KALMAN_ENTITY_ORACLE = """
WITH RECURSIVE daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS DOUBLE) AS y
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1, 2
),
o AS (
    SELECT user_id, day, y,
           row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
    FROM daily
),
kal AS (
    SELECT user_id, rn, day, y, y AS x, CAST(1.0 AS DOUBLE) AS p
    FROM o WHERE rn = 1
    UNION ALL
    SELECT o.user_id, o.rn, o.day, o.y,
           kal.x + ((kal.p + 0.01) / ((kal.p + 0.01) + 4.0))
                   * (o.y - kal.x),
           (1.0 - ((kal.p + 0.01) / ((kal.p + 0.01) + 4.0)))
               * (kal.p + 0.01)
    FROM kal JOIN o ON o.user_id = kal.user_id AND o.rn = kal.rn + 1
),
last AS (SELECT user_id, MAX(rn) AS n_days FROM o GROUP BY user_id)
SELECT k.user_id, CAST(l.n_days AS BIGINT) AS n_days, k.day AS last_day,
       round(k.x, 6) AS level, round(k.p, 6) AS variance
FROM kal k JOIN last l ON l.user_id = k.user_id AND k.rn = l.n_days
"""


def _bucketed_kalman(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user 1-D Kalman fold over the users of ONE hash bucket: the
    sequential recursion runs as a plain float loop per user (the exact
    IEEE op order of the recursive-CTE oracle — no vectorized
    reassociation), while the Python-call overhead amortizes over the
    whole bucket instead of one call per user."""
    pdf = pdf.sort_values(["user_id", "day"], kind="mergesort")
    out_uid: list[int] = []
    out_nd: list[int] = []
    out_day: list[object] = []
    out_x: list[float] = []
    out_p: list[float] = []
    for uid, g in pdf.groupby("user_id", sort=False):
        ys = g["y"].to_numpy()
        x = float(ys[0])
        p = 1.0
        for yv in ys[1:]:
            pp = p + 0.01
            gn = pp / (pp + 4.0)
            x = x + gn * (float(yv) - x)
            p = (1.0 - gn) * pp
        out_uid.append(int(uid))
        out_nd.append(len(ys))
        out_day.append(g["day"].iloc[-1])
        out_x.append(x)
        out_p.append(p)
    return pd.DataFrame(
        {
            "user_id": pd.Series(out_uid, dtype="int64"),
            "n_days": pd.Series(out_nd, dtype="int64"),
            "last_day": pd.Series(out_day),
            "level": pd.Series(out_x, dtype="float64"),
            "variance": pd.Series(out_p, dtype="float64"),
        }
    )


@query("ts_kalman_entity_level", oracle=_KALMAN_ENTITY_ORACLE)
def ts_kalman_entity_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-ENTITY Kalman level filter: the local-level recursion of
    ``ts_kalman_level_filter`` (q=0.01, r=4, x0=first observation,
    p0=1) folded independently over every user's daily event-count
    series, emitting each user's final filtered level, posterior
    variance, day count, and last active day — the per-entity
    state-space smoother a personalization / anomaly pipeline runs at
    full corpus width, where the driver-fold shape of the global
    variant cannot go.

    SCALE: the recursion has no window-sum closed form (each step
    divides by the predicted variance), so it runs inside
    ``applyInPandas`` — keyed NOT by user (one Python call per entity)
    but by ``pmod(xxhash64(user_id), 64)`` hash buckets, the same
    shape as :func:`pyfunc_cogrouped_user_profile`: one shuffle of the
    (user, day) rollup, 64 Python calls total, per-user sequential
    fold inside the call. Python cost scales with buckets × rows, not
    entities. Rounding happens JVM-side AFTER the fold (numpy rounds
    half-even, Spark/DuckDB half-away). The oracle runs the identical
    recursion as a user-partitioned recursive CTE."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    n_buckets = 64
    folded = (
        daily.withColumn(
            "bucket",
            F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)).cast("int"),
        )
        .groupBy("bucket")
        .applyInPandas(
            lambda pdf: _bucketed_kalman(pdf),
            "user_id bigint, n_days bigint, last_day date, "
            "level double, variance double",
        )
    )
    return folded.select(
        "user_id",
        "n_days",
        "last_day",
        F.round("level", 6).alias("level"),
        F.round("variance", 6).alias("variance"),
    )
