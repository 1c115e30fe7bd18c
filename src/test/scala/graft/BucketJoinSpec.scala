package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import graft.sources.Sources

/** Proves the bucketed-table co-location contract: a join of two tables
  * bucketed on the join key with equal bucket counts plans with ZERO
  * shuffle exchanges — the write-time amortization that makes repeated
  * fact-fact joins cheap at 100 TB.
  */
class BucketJoinSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
    case q: QueryStageExec => shuffles(q.plan) // AQE stages have no children
    case s: ShuffleExchangeLike => s +: s.children.flatMap(shuffles)
    case other => other.children.flatMap(shuffles)
  }

  test("equal-bucket join of two bucketed tables has no shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("bucketwh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '$wh'")
    try {
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val customer = spark.read.parquet(s"$sf/customer.parquet")
        .select("c_custkey", "c_name", "c_mktsegment")
      Sources.writeBucketed(orders, "bucketdb.orders_b", 8, "o_custkey")
      Sources.writeBucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "bucketdb.customer_b", 8, "o_custkey")

      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("bucketdb.orders_b")
          .join(spark.table("bucketdb.customer_b"), "o_custkey")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        j.collect() // executes; AQE finalizes the plan
        // the ONLY exchange allowed is the one for the final groupBy —
        // the join itself must read co-located buckets shuffle-free
        val ex = shuffles(j.queryExecution.executedPlan)
        assert(ex.size <= 1,
          s"expected at most the aggregation exchange, got ${ex.size}:\n" +
            j.queryExecution.executedPlan)
        // same join UNBUCKETED shuffles both sides: 3 exchanges total
        val plain = orders
          .join(customer, orders("o_custkey") === customer("c_custkey"))
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        plain.collect()
        val plainEx = shuffles(plain.queryExecution.executedPlan)
        assert(plainEx.size > ex.size,
          s"unbucketed join should shuffle more (${plainEx.size} vs ${ex.size})")
        // and the bucketed join returns the same result
        val got = j.as[(String, Long)].collect().toMap
        val want = plain.as[(String, Long)].collect().toMap
        assert(got == want)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      }
    } finally {
      spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")
    }
  }
}
