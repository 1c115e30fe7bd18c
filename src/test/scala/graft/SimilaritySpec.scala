package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.dedup.Dedup

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("brute-force cosine topk matches a driver-side recomputation") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val (qid, qv) = vecs.head
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.filter(_._1 != qid)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(Similarity.K).map(_._1).toSeq
    val got = Similarity.cosineTopK(spark, sf)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == expected)
  }

  test("ann topk returns vectors from the query's LSH buckets with sane recall") {
    val ann = Similarity.annTopK(spark, sf).as[(Long, Double)].collect()
    assert(ann.nonEmpty)
    // every ANN hit must also score exactly like the brute-force path
    val brute = Similarity.cosineTopK(spark, sf).as[(Long, Double)].collect().toMap
    val cosById = {
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = e.orderBy("vec_id").limit(1)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      e.crossJoin(q).where(col("vec_id") =!= col("q_id"))
        .select(col("vec_id"), Dedup.cosine(col("v"), col("qv")).as("c"))
        .as[(Long, Double)].collect().toMap
    }
    ann.foreach { case (id, c) => assert(c == cosById(id)) }
    // candidates sorted desc
    assert(ann.map(_._2).toSeq == ann.map(_._2).sortBy(-_).toSeq)
    // OR-amplified 4x4-bit LSH on ~500 vecs should keep some true top-k
    val recall = brute.keySet.count(ann.map(_._1).toSet).toDouble / brute.size
    assert(recall > 0.0, "ANN found none of the true top-k")
  }
}
