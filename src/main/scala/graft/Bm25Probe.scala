import graft.textanalysis.TextAnalysis
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Verify.session("8")
    val r = TextAnalysis.bm25(spark, "/root/testdata/sf0.001")
    r.show(20, false)
    val n = r.count()
    val self = r.where(org.apache.spark.sql.functions.col("query_id") ===
      org.apache.spark.sql.functions.col("doc_id"))
      .where(org.apache.spark.sql.functions.col("rank") === 1).count()
    val nq = r.select("query_id").distinct().count()
    println(s"rows=$n queries=$nq selfAtRank1=$self")
    spark.stop()
  }
}
