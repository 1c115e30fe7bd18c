package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Time-interval operators the TPC-H delta demands beyond as-of joins:
  * interval (range-overlap) joins and incremental materialized-view
  * maintenance. Both are shapes Spark's built-in planner punts on — a
  * raw `ON ts BETWEEN lo AND hi` predicate plans as BroadcastNestedLoop
  * (O(n·m), the plan PlanAuditSpec bans) and a view refresh naively
  * rescans history — so each gets the standard scale decomposition,
  * declared and oracle-checked.
  */
object Temporal {

  /** Epoch µs of 2024-01-01T00:00:00Z — the fixture grid origin (the
    * events table spans Jan 2024 at every SF).
    */
  val GridOriginUs = 1704067200000000L

  /** Interval-join fixture: 120 maintenance windows, one every 6 h over
    * the 30-day span, each 2 h long (so ⅓ of events fall in some window
    * and ⅔ outside — both branches exercised).
    */
  val WindowEveryUs = 21600000000L
  val WindowLenUs   = 7200000000L
  val NWindows      = 120

  /** Bucket width for the interval-join equi-decomposition: 1 h. */
  val BucketUs = 3600000000L

  /** Interval (range) join — match each point-in-time event to the fixed
    * window(s) covering it, BUCKETIZED: a raw range predicate gives
    * Spark no equi-key and plans as a nested-loop scan of every
    * (event, window) pair. Instead each window explodes to the
    * [[BucketUs]] buckets it covers (bounded: len/bucket + 1 rows per
    * window — here 2), events map to their single containing bucket, and
    * the match becomes an EQUI-join on the 8-byte bucket id plus a
    * residual range filter. Each (event, window) pair meets exactly once
    * (the event's own bucket), so no post-join dedup is needed even when
    * windows overlap. This is the Databricks range-join-hint / interval
    * tree technique expressed in plain operators: at 100 TB both sides
    * shuffle-partition by bucket, parallelism scales with the time span,
    * and a skewed bucket (flash-crowd hour) is AQE-splittable. Empty
    * windows survive via a left join back to the window spine — the
    * audit's contract is one row per window. Output: (w_id, w_start_us,
    * n_events, n_users, value_sum) ordered by w_id.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val wins = spark.range(NWindows.toLong)
      .select(col("id").as("w_id"),
        (lit(GridOriginUs) + col("id") * WindowEveryUs).as("w_start_us"))
    val winBuckets = wins.select(col("w_id"), col("w_start_us"),
      explode(sequence(expr(s"w_start_us div $BucketUs"),
        expr(s"(w_start_us + ${WindowLenUs - 1}) div $BucketUs"))).as("bkt"))
    val e = Tables.load(spark, dir, "events")
      .select(expr("ts_ns div 1000").as("ts_us"), col("user_id"),
        col("value"))
      .withColumn("bkt", expr(s"ts_us div $BucketUs"))
    val matched = e.join(winBuckets, Seq("bkt"))
      .where(col("ts_us") >= col("w_start_us") &&
        col("ts_us") < col("w_start_us") + WindowLenUs)
      .groupBy("w_id")
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("value_sum"))
    wins.join(matched, Seq("w_id"), "left")
      .select(col("w_id"), col("w_start_us"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        coalesce(col("value_sum"), lit(0.0d)).as("value_sum"))
      .orderBy("w_id")
  }

  val intervalJoinSql: String =
    s"""WITH w AS (SELECT CAST(k AS BIGINT) AS w_id,
            $GridOriginUs + k * $WindowEveryUs AS w_start_us
          FROM range(0, $NWindows) t(k)),
        m AS (SELECT w.w_id, count(*) AS n_events,
            count(DISTINCT e.user_id) AS n_users,
            CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
          FROM w JOIN events e
            ON epoch_us(e.ts) >= w.w_start_us
           AND epoch_us(e.ts) < w.w_start_us + $WindowLenUs
          GROUP BY w.w_id)
        SELECT w.w_id, w.w_start_us,
          CAST(coalesce(m.n_events, 0) AS BIGINT) AS n_events,
          CAST(coalesce(m.n_users, 0) AS BIGINT) AS n_users,
          coalesce(m.value_sum, 0.0) AS value_sum
        FROM w LEFT JOIN m USING (w_id) ORDER BY w_id"""

  /** MV refresh cutoff: epoch µs of 2024-01-22T00:00:00Z — history
    * before it is the materialized base, the last ~9 days are the delta.
    */
  val MvCutoffUs = GridOriginUs + 21L * 86400000000L

  /** Incremental materialized-view maintenance — the property that makes
    * a daily-refreshed corpus/metrics table affordable: for a
    * sum/count-monoid view V(K), V(base ∪ delta) = V(base) ⊕ V(delta),
    * so the refresh aggregates ONLY the delta and merges it into the
    * stored base by key — never rescanning history. Declared here as the
    * full identity so the oracle can hash-gate it: the view (per
    * event-type per UTC day: event count, distinct-user count surrogate,
    * exact cent sum) is computed as agg(base) ⊕ agg(delta) via a
    * full-outer merge on the view key, and the oracle computes
    * agg(base ∪ delta) directly — equal iff the maintenance algebra is
    * right. Distinct-count is NOT a monoid, so the view carries the
    * mergeable surrogate instead (per-key HLL would be the sketch form;
    * here the exact per-(key,user) sub-aggregate is itself the stored
    * base — the standard two-level MV). 100 TB: the delta aggregate
    * touches only new partitions (partition pruning on the date column
    * in a real layout); the merge is a shuffle of two ALREADY-AGGREGATED
    * frames — view-cardinality rows, not data rows.
    * Output: (event_type, day, n_events, n_users, cents) by type, day.
    */
  def mvIncremental(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("user_id"),
        expr("ts_ns div 1000").as("ts_us"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .withColumn("day", expr("ts_us div 86400000000"))
    def lvl1(part: DataFrame): DataFrame =
      part.groupBy("event_type", "day", "user_id")
        .agg(count(lit(1)).as("n"), sum("cents").as("c"))
    // two-level MV: level 1 keyed by (view key, user) makes the distinct
    // user count a mergeable sum-of-changes; level 2 is the served view
    val base  = lvl1(e.where(col("ts_us") <  MvCutoffUs))
    val delta = lvl1(e.where(col("ts_us") >= MvCutoffUs))
    val merged = base.select(col("event_type"), col("day"), col("user_id"),
        col("n"), col("c"))
      .unionByName(delta)
      .groupBy("event_type", "day", "user_id")
      .agg(sum("n").as("n"), sum("c").as("c"))
    merged.groupBy("event_type", "day")
      .agg(sum("n").as("n_events"), count(lit(1)).as("n_users"),
        sum("c").as("cents"))
      .orderBy("event_type", "day")
  }

  val mvIncrementalSql: String =
    """SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         count(*) AS n_events,
         count(DISTINCT user_id) AS n_users,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       FROM events GROUP BY 1, 2 ORDER BY event_type, day"""
}
