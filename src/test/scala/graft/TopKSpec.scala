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

  test("buffer compaction: groups far larger than 2k stay correct") {
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle(
      (1 to 1000).map(i => ("g", f"t$i%04d", i.toDouble)))
    val got = TopK.topKPerGroup(rows.toDF("grp", "tag", "score"),
        "grp", "tag", "score", 3)
      .as[(String, String, Double)].collect().toList.sortBy(-_._3)
    assert(got == List(("g", "t1000", 1000.0), ("g", "t0999", 999.0),
      ("g", "t0998", 998.0)))
  }

  test("group column keeps its native type (no string round-trip)") {
    val df = Seq((1L, "a", 2.0), (1L, "b", 1.0), (2L, "c", 5.0))
      .toDF("grp", "tag", "score")
    val out = TopK.topKPerGroup(df, "grp", "tag", "score", 1)
    assert(out.schema("grp").dataType.typeName === "long")
    assert(out.as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 2.0), (2L, "c", 5.0)))
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

  test("NaN scores rank first, matching the window form's sort order") {
    // Spark sorts NaN as the largest double, so a descending window ranks
    // NaN rows first; the aggregator must agree (ADVICE r03).
    val df = Seq(
      ("g", "n", Double.NaN), ("g", "a", 5.0), ("g", "b", 3.0),
      ("g", "z", Double.NaN), ("g", "c", 1.0)).toDF("grp", "tag", "score")
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("tag").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2, r._3.isNaN, if (r._3.isNaN) 0.0 else r._3)).toSet
    val viaHeap = TopK.topKPerGroup(df, "grp", "tag", "score", 3)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2, r._3.isNaN, if (r._3.isNaN) 0.0 else r._3)).toSet
    assert(viaHeap == viaWindow)
    assert(viaHeap.map(_._2) == Set("n", "z", "a"))
  }

  test("negative zero ties with positive zero under the tag tiebreak") {
    val df = Seq(("g", "b", -0.0), ("g", "a", 0.0), ("g", "c", -1.0))
      .toDF("grp", "tag", "score")
    val got = TopK.topKPerGroup(df, "grp", "tag", "score", 2)
      .as[(String, String, Double)].collect().toList.map(_._2).sorted
    // −0.0 == 0.0, so the two zero rows win on tag asc: a then b
    assert(got == List("a", "b"))
  }
}
