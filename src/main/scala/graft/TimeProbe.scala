package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev tool: stage-level timing of the dedup path. Not part of the contract. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Verify.session("32")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[time] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("tokens+arrays")(Dedup.shingleArrays(docs).count())
    time("shingles exploded")(Dedup.shingles(docs).count())
    time("shingles + modP")(Dedup.shingles(docs)
      .select(col("shingle_h") % graft.functions.Hashing.P).count())
    time("minhash signatures")(Dedup.minhashSignatures(docs).count())
    time("minhash full")(Dedup.minhashCandidates(spark, sfDir).count())
    time("simhash signatures")(Dedup.simhashSignatures(docs).count())
    time("simhash pairs")(Dedup.simhashPairs(spark, sfDir).count())
    time("jaccard")(Dedup.jaccardPairs(spark, sfDir).count())
    spark.stop()
  }
}
