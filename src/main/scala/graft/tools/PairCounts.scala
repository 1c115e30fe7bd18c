package graft.tools

/** Candidate-PAIR census for the pair-emission dedup/ANN family
  * (round-10 verdict ask 3): runs each family query at the given sf dir
  * and prints one JSON line {query: emitted_rows}. Seconds alone cannot
  * separate "the plan went quadratic" from "the corpus genuinely holds
  * more duplicate mass" — pair counts next to seconds decompose growth
  * into workload (pairs grew, sec/pair flat) vs plan cost (sec/pair
  * grew). Used by tools/scale_curve.py for the BENCH_SCALE record.
  *
  * Usage: runMain graft.tools.PairCounts [sfDir]
  */
object PairCounts {
  val Family: Seq[String] = Seq(
    "q_containment", "q_dedup_jaccard", "q_dedup_cross_source",
    "q_dup_ngrams", "q_dedup_embed_lsh", "q_dedup_embed_sharded",
    "q_dedup_minhash", "q_dedup_simhash", "q_winnow_overlap",
    "q_dedup_templates", "q_dedup_incremental_near",
    "q_dedup_embed_sharded_incr")
  // (the semantic-dedup family's decision tables — q_dedup_semantic*,
  // q_dedup_semantic_sharded_incr — are deliberately NOT in the census:
  // their row count is one per input vector by construction, so a
  // recall drift would be invisible to it; their drift gate is the
  // oracle hash itself)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val qs = graft.SparkEntry.queries
    val counts = Family.map { name =>
      val n = try qs(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[paircounts] $name failed: ${e.getMessage}"); -1L
      }
      s""""$name":$n"""
    }
    println(s"""{"metric":"pair_counts","sf":"$sfDir","pairs":{${counts.mkString(",")}}}""")
    spark.stop()
  }
}
