package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("bounded-heap aggregator equals the row_number window form") {
    val sf = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderpriority").as("grp"),
        col("o_orderkey").cast("string").as("tag"),
        col("o_totalprice").cast("double").as("score"))
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("tag").asc)
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5).drop("rn")
      .as[(String, String, Double)].collect().toSet
    val viaHeap = TopK.topKPerGroup(o, "grp", "tag", "score", 5)
      .as[(String, String, Double)].collect().toSet
    assert(viaHeap == viaWindow && viaHeap.nonEmpty)
  }

  test("heap never holds more than k and handles ties deterministically") {
    val df = Seq(
      ("g", "b", 2.0), ("g", "a", 2.0), ("g", "c", 2.0),
      ("g", "d", 1.0), ("g", "e", 3.0)).toDF("grp", "tag", "score")
    val got = TopK.topKPerGroup(df, "grp", "tag", "score", 3)
      .as[(String, String, Double)].collect().toList
      .sortBy(r => (-r._3, r._2))
    // top-3 = e(3.0), then ties at 2.0 broken by tag asc: a, b
    assert(got == List(("g", "e", 3.0), ("g", "a", 2.0), ("g", "b", 2.0)))
  }
}
