package graft

import org.apache.spark.sql.functions._

/** Evidence for the engine's bucketing story: two tables bucketed (and
  * sorted) on the join key by the SAME bucket count join with ZERO
  * exchanges — the co-located join that makes repeated fact⋈fact joins
  * affordable at 100 TB (pay the layout shuffle once at write time,
  * never again per query). Companion to SkewJoinSpec (runtime skew
  * handling) and the broadcast-join paths (small dims).
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed sorted tables plans no exchange") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lines")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val sf = "/root/testdata/sf0.001"
      spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bkt_orders")
      spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bkt_lines")

      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_lines"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("qty"), first("o_totalprice").as("price"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator
        .count(l => l.contains("Exchange") && !l.contains("Reused"))
      assert(exchanges == 0,
        s"co-bucketed join must not shuffle; plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join")

      // control: the SAME join over the raw (unbucketed) parquet shuffles
      val raw = spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .join(spark.read.parquet(s"$sf/lineitem.parquet")
          .select("l_orderkey", "l_quantity"),
          col("o_orderkey") === col("l_orderkey"))
      raw.count()
      val rawPlan = raw.queryExecution.executedPlan.toString
      assert(rawPlan.linesIterator.exists(_.contains("Exchange")),
        "control join should shuffle — otherwise this test proves nothing")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lines")
    }
  }
}
