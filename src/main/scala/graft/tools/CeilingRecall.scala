package graft.tools

import org.apache.spark.sql.DataFrame
import graft.dedup.Dedup
import graft.model.Tables

/** df-CEILING recall audit (round-10 verdict ask #5): the
  * jaccard/containment/winnow inverted index drops features with
  * document frequency > [[Dedup.MaxShingleDf]] from BOTH pair emission
  * and size accounting — a semantics change mirrored in the oracle, but
  * whose false-negative bill (true pairs whose overlap lives in hot
  * features) had only ever been argued, not measured. This probe runs
  * each family twice on the same corpus — at the declared ceiling and
  * with the ceiling OFF (maxDf = Int.MaxValue, the unceilinged
  * semantics as ground truth) — and reports pair recall AND the extra
  * pairs the ceiling admits (a pair can clear the threshold over
  * retained features only), per corpus:
  *
  *   - a CLEAN amplified corpus, where observed df sits far below the
  *     ceiling, so the expected answer is recall = 1.0, extra = 0
  *     (the ceiling provably does nothing until df actually explodes);
  *   - the PLANTED hot-shingle corpus (`graft.tools.PlantSkew`: one
  *     12-token sentence appended to 10% of documents), the adversarial
  *     case the ceiling exists for — here the measured recall IS the
  *     bill, reported next to the unceilinged run's pair volume so the
  *     bill can be weighed against the |hot docs|² work it avoids.
  *
  * When exactly TWO dirs are given (clean, planted — the default), a
  * CONTENT-TRUTH cross metric is also reported: the planted corpus is
  * byte-identical to the clean one plus the appended hot sentence, so
  * the clean corpus's unceilinged pairs are the pairs that share REAL
  * content — the recall that matters is how many of those the ceilinged
  * run on the planted corpus still finds. (On the planted corpus the
  * unceilinged "truth" itself is dominated by pairs whose only overlap
  * IS the planted boilerplate — pairs a production dedup must NOT emit;
  * C4/Gopher strip boilerplate for exactly this reason — so the naive
  * recall number under-credits the ceiling for removing them.)
  *
  * Usage: runMain graft.tools.CeilingRecall [dir ...]
  * (default: scaledata/sf1 scaledata/sf1skew)
  */
object CeilingRecall {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("scaledata/sf1", "scaledata/sf1skew")
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def pct(num: Long, den: Long): String =
      String.format(java.util.Locale.ROOT, "%.4f",
        Double.box(num.toDouble / math.max(1L, den)))
    val familyNames = Seq("jaccard", "containment", "winnow")
    def familyFn(docs: DataFrame, name: String): Int => DataFrame =
      name match {
        case "jaccard" => maxDf => Dedup.jaccardPairsFrom(docs, maxDf)
        case "containment" => maxDf => Dedup.containmentPairsFrom(docs, maxDf)
        case "winnow" => maxDf => Dedup.winnowOverlapFrom(docs, maxDf)
      }
    val memo = scala.collection.mutable.Map[(String, String, Int), Set[(Long, Long)]]()
    def pairs(dir: String, name: String, maxDf: Int): Set[(Long, Long)] =
      memo.getOrElseUpdate((dir, name, maxDf), {
        val docs = Tables.loadSpread(spark, dir, "documents", "doc_id")
        familyFn(docs, name)(maxDf).select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      })
    for (dir <- dirs; name <- familyNames) {
      val ceiled = pairs(dir, name, Dedup.MaxShingleDf)
      val full = pairs(dir, name, Int.MaxValue)
      val hit = (ceiled intersect full).size.toLong
      System.err.println(
        s"[ceilrecall] dir=$dir family=$name maxDf=${Dedup.MaxShingleDf} " +
          s"truePairs=${full.size} ceiledPairs=${ceiled.size} " +
          s"recall=${pct(hit, full.size.toLong)} " +
          s"extraPairs=${(ceiled -- full).size} " +
          s"missedPairs=${(full -- ceiled).size}")
    }
    if (dirs.size == 2) {
      val Seq(clean, planted) = dirs
      for (name <- familyNames) {
        val contentTruth = pairs(clean, name, Int.MaxValue)
        val ceiledSkew = pairs(planted, name, Dedup.MaxShingleDf)
        val fullSkew = pairs(planted, name, Int.MaxValue)
        val hit = (ceiledSkew intersect contentTruth).size.toLong
        val boilerOnly = (fullSkew -- contentTruth).size
        System.err.println(
          s"[ceilrecall] CONTENT family=$name " +
            s"contentTruth=${contentTruth.size} " +
            s"recoveredByCeiledPlanted=$hit " +
            s"contentRecall=${pct(hit, contentTruth.size.toLong)} " +
            s"boilerplateOnlyPairsInUnceiledPlanted=$boilerOnly")
      }
    }
    spark.stop()
  }
}
