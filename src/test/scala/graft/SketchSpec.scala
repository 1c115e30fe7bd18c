package graft

import org.apache.spark.sql.functions._
import graft.textanalysis.TextAnalysis

/** The mergeable-sketch contract behind `q_sketch_shards`: sketch bytes
  * are STATE — they survive storage and merge without rescanning data.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("per-shard HLL sketches survive parquet and merge to the corpus count") {
    val t = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"),
        explode(filter(split(lower(coalesce(col("text"), lit(""))), "\\s+"),
          w => length(w) > 0)).as("w"))
    val exact = t.agg(countDistinct("w")).as[Long].head()
    // build per-source sketches ONCE and persist the bytes
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    t.groupBy("source").agg(hll_sketch_agg(col("w")).as("sk"))
      .write.mode("overwrite").parquet(dir)
    // a "later run" merges the stored bytes — no access to the data
    val est = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .as[Long].head()
    assert(math.abs(est - exact).toDouble <=
      math.max(10.0, TextAnalysis.SketchRelErr * exact),
      s"merged estimate $est vs exact $exact")
    // adding one new shard = one sketch build + a merge of stored bytes
    val extraDir = writeDocs(Seq(100000L -> "zzznovel wordsets appearhere"),
      source = "zz_new")
    val extra = spark.read.parquet(s"$extraDir/documents.parquet")
      .select(col("source"),
        explode(filter(split(lower(coalesce(col("text"), lit(""))), "\\s+"),
          w => length(w) > 0)).as("w"))
    extra.groupBy("source").agg(hll_sketch_agg(col("w")).as("sk"))
      .write.mode("append").parquet(dir)
    val est2 = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .as[Long].head()
    // three genuinely novel tokens joined the vocabulary
    assert(est2 > est, s"union must grow: $est -> $est2")
  }
}
