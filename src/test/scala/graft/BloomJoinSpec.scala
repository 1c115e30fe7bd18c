package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Evidence for the engine's big-big join pruning story: when a selective
  * dim filter feeds a shuffle join, Spark's runtime bloom filter builds a
  * sketch of the surviving keys and applies `might_contain` on the fact
  * side BELOW its shuffle — at 100 TB that is semi-join reduction, the
  * optimization that keeps a filtered fact⋈fact join from shuffling rows
  * the probe side will discard anyway. Size thresholds are scaled down to
  * test data; clusters run the same rule at its defaults (on since
  * Spark 3.4).
  */
class BloomJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val tuned = Map(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("a selective dim filter injects a bloom filter on the fact side") {
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      val o = Tables.load(spark, sf, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
      val l = Tables.load(spark, sf, "lineitem")
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"runtime bloom filter was not injected:\n$plan")
      // and the pruned join still aggregates correctly
      val n = joined.collect().head.getLong(1)
      assert(n > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
