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

  test("explicit bloom prefilter: no false negatives, rows shed, exact result") {
    import graft.relational.Relational
    // the operator's own result equals the plain (bloom-free) semi join agg
    val got = Relational.bloomPrefilterJoin(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val dim = Tables.load(spark, sf, "part")
      .where(col("p_size") >= Relational.BloomMinSize).select("p_partkey")
    val plain = Tables.load(spark, sf, "lineitem")
      .join(dim, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == plain)
    // the bloom itself: zero false negatives over dim keys, and the
    // prefilter sheds a meaningful share of the fact scan (fpp 1%,
    // dim keeps ~6% of parts → survivors well under half the fact)
    val bf = dim.stat.bloomFilter("p_partkey", 100000L, 0.01)
    val dimKeys = dim.collect().map(_.getLong(0))
    assert(dimKeys.forall(bf.mightContain))
    val fact = Tables.load(spark, sf, "lineitem").select("l_partkey")
      .collect().map(_.getLong(0))
    val survivors = fact.count(bf.mightContain)
    assert(survivors < fact.length / 2,
      s"bloom shed too little: $survivors of ${fact.length}")
  }
}
