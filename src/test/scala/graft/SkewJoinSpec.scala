package graft

import org.apache.spark.sql.functions._

/** Evidence that the AQE skew-join claim in [[graft.Sessions.production]]
  * actually fires: a deliberately skewed fact⋈dim sort-merge join must
  * show `skew=true` / skewed AQEShuffleRead in the FINAL adaptive plan,
  * with the hot partition split into multiple tasks. Thresholds are
  * scaled down to test size — the production builder uses the same knobs
  * at cluster defaults.
  */
class SkewJoinSpec extends SparkSpec {

  private val tuned = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.shuffle.partitions" -> "8")

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      // hot key 0 carries 40k fat rows; keys 1..400 one row each — one
      // shuffle partition dwarfs the median by far more than factor 2
      val fact = spark.range(0, 40000)
        .select(lit(0L).as("k"), concat(lit("x" * 200), col("id")).as("payload"))
        .union(spark.range(1, 401)
          .select(col("id").as("k"), col("id").cast("string").as("payload")))
      val dim = spark.range(0, 401).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = fact.join(dim, "k").select(sum(length(col("payload"))).as("bytes"))
      val rows = joined.collect()
      assert(rows.head.getLong(0) > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
