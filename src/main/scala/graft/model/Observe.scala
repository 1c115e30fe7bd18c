package graft.model

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Plan-level observed metrics — the exactly-once complement to the
  * advisory [[PipelineCounters]] accumulators. `Dataset.observe` evaluates
  * aggregate expressions INSIDE the executed plan, so the reported values
  * correspond to exactly the rows the action consumed: task retries and
  * speculative duplicates cannot double-count (the accumulator channel's
  * documented weakness). The same call works on streaming DataFrames,
  * where per-micro-batch values surface in
  * `StreamingQueryProgress.observedMetrics` — accumulators have no
  * streaming story at all.
  *
  * Cost model: observe adds a CollectMetrics node — a map-side-only
  * aggregation merged on the driver, no extra shuffle, no extra pass.
  */
object Observe {

  /** Attach named metrics to `df`; read them from the returned
    * [[Observation]] AFTER an action on the returned frame.
    */
  def withMetrics(df: DataFrame, name: String, metrics: Seq[Column])
      : (DataFrame, Observation) = {
    val obs = new Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Input-quality metrics for a review/document frame with a `text`
    * column: row count, null-text count, total text bytes — the numbers
    * an ingest job reports per batch.
    */
  def inputStats(df: DataFrame): (DataFrame, Observation) =
    withMetrics(df, "graft.input_stats", Seq(
      count(lit(1)).as("n_rows"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_texts"),
      sum(coalesce(length(col("text")).cast("long"), lit(0L))).as("text_chars")))
}
