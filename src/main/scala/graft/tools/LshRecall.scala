package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: measured RECALL of the declared adaptive-width LSH
  * near-dup operator against exact brute-force ground truth — the
  * number behind SURVEY §9.29's "standard recall trade" sentence.
  *
  * Ground truth is the full triangular pair set with cosine ≥
  * [[graft.dedup.Dedup.CosineThreshold]] (a BroadcastNestedLoopJoin:
  * one side is ~n·dim doubles, broadcastable at every probed SF; the
  * codegen'd dot keeps the O(n²) scan CPU-bound). Recall is reported
  * per cosine band, because that is how random-hyperplane LSH
  * degrades: a pair at cosine c collides per table with probability
  * (1 − θ/π)^planes, θ = arccos c — near-dup pairs (c → 1) survive any
  * practical width, borderline pairs pay the width. Compares the
  * declared adaptive width ([[graft.similarity.Similarity.lshPlanesFor]])
  * against the floor width, so the cost of the round-10 contract
  * change is a table, not a claim.
  *
  * Usage: runMain graft.tools.LshRecall [sfDir]
  */
object LshRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/scaledata/sf1"
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.similarity.Similarity
    val e = graft.model.Tables.loadSpread(spark, sfDir, "embeddings", "vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.dedup.Dedup.dot(col("v"), col("v"))))
    val n = e.count()
    val adaptive = Similarity.lshPlanesFor(n)

    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    val cosT = graft.dedup.Dedup.dot(col("va"), col("vb")) /
      (col("na") * col("nb"))
    val truth = a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosT.as("cos"))
      .where(col("cos") >= graft.dedup.Dedup.CosineThreshold)
      // band by cosine: [0.4,0.6) [0.6,0.8) [0.8,0.95) [0.95,1]
      .withColumn("band",
        when(col("cos") >= 0.95, ">=0.95")
          .when(col("cos") >= 0.8, "0.80-0.95")
          .when(col("cos") >= 0.6, "0.60-0.80")
          .otherwise("0.40-0.60"))
      .localCheckpoint(true)
    val nTruth = truth.count()

    def pct(num: Long, den: Long): String =
      String.format(java.util.Locale.ROOT, "%.4f",
        Double.box(num.toDouble / math.max(1L, den)))
    for (planes <- Seq(Similarity.LshPlanes, adaptive).distinct) {
      val found = Similarity.lshNearDupPairsWith(spark, sfDir, planes)
        .select(col("vec_a"), col("vec_b"), lit(1).as("hit"))
      val rows = truth.join(found, Seq("vec_a", "vec_b"), "left")
        .groupBy("band")
        .agg(count(lit(1)).as("truth"), sum(coalesce(col("hit"), lit(0))).as("found"))
        .orderBy("band").collect()
      val tot = rows.map(_.getLong(1)).sum
      val hit = rows.map(_.getLong(2)).sum
      // the GUARANTEE number (round-11 contract): recall over pairs at
      // cosine ≥ NearDupCosine must clear LshRecallTarget at any width
      // the table budget covers — the bands below it are best-effort
      val designBands = Set(">=0.95", "0.80-0.95")
      val dTot = rows.filter(r => designBands(r.getString(0))).map(_.getLong(1)).sum
      val dHit = rows.filter(r => designBands(r.getString(0))).map(_.getLong(2)).sum
      System.err.println(
        s"[lshrecall] sf=$sfDir n=$n planes=$planes " +
          s"tables=${Similarity.lshTablesFor(planes)} " +
          s"truePairs=$nTruth recovered=$hit recall=${pct(hit, tot)} " +
          s"designBandTruth=$dTot designBandRecall=${pct(dHit, dTot)} " +
          s"(target ${Similarity.LshRecallTarget} at cosine >= ${Similarity.NearDupCosine})")
      rows.foreach { r =>
        System.err.println(
          s"[lshrecall]   band=${r.getString(0)} truth=${r.getLong(1)} " +
            s"found=${r.getLong(2)} recall=${pct(r.getLong(2), r.getLong(1))}")
      }
    }
    spark.stop()
  }
}
