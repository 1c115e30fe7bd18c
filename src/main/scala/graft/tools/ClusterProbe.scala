package graft.tools
import graft.Verify
import graft.dedup.Dedup

/** Dev tool: split the near-dup cluster cost into pair generation vs
  * label propagation, and report the round count. Not part of the
  * driver contract.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Verify.session("32")
    val pairs = Dedup.jaccardPairs(spark, sfDir).select("doc_a", "doc_b")
    val t0 = System.nanoTime()
    val n = pairs.count()
    val t1 = System.nanoTime()
    val (labels, rounds) = Dedup.clustersFromPairsCounted(pairs)
    val m = labels.count()
    val t2 = System.nanoTime()
    println(f"[probe] pairs=$n (${(t1-t0)/1e9}%.2f s) clusters rows=$m rounds=$rounds (${(t2-t1)/1e9}%.2f s)")
    spark.stop()
  }
}
