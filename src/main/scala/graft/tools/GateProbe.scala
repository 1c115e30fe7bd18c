package graft.tools

import org.apache.spark.sql.functions._

/** One-batch diagnostic of the grown-gate probe plan: times each stage
  * of `shardedGateBatch`'s cross-index path against a persisted index
  * and prints the physical plans — the dev loop for the round-15 layout
  * work (the bench probe only reports whole-batch wall time).
  *
  * Usage: runMain graft.tools.GateProbe <indexDir> <seedSrc> [batchRows]
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val indexDir = args(0)
    val seedSrc = args(1)
    val batchRows = if (args.length > 2) args(2).toInt else 1667
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.sources.VersionedTable
    import graft.similarity.Similarity

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[gateprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val seedN = VersionedTable.readTagged(spark, indexDir, "gv").count()
    val w = Similarity.lshPlanesFor(seedN)
    val ps = Similarity.shardedParamsFor(w)
    System.err.println(s"[gateprobe] stored=$seedN w=$w ps=$ps " +
      s"cellFiles=${VersionedTable.liveTagged(indexDir, "gc").size}")
    val batch = spark.read.parquet(s"$seedSrc/embeddings.parquet")
      .select((col("vec_id") + (1L << 40)).as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .limit(batchRows).localCheckpoint()

    t("withNorm only")(Similarity.withNorm(batch).count())
    val coded = t("code batch")(
      graft.streaming.StreamingOps.shardedGateCoded(batch, w)
        .localCheckpoint())
    t("code batch AGAIN (fresh lineage)")(
      graft.streaming.StreamingOps.shardedGateCoded(batch, w).count())
    val bc = coded.select(col("vec_id"), explode(col("cks")).as("ck"))
      .localCheckpoint()
    val cand = t("candidate collect")(
      bc.select(col("ck")).distinct().collect().map(_.getLong(0)))
    System.err.println(s"[gateprobe] candidates=${cand.length}")
    val sorted = cand.sorted
    val keep = (mn: Long, mx: Long) => {
      val i = java.util.Arrays.binarySearch(sorted, mn)
      val p = if (i >= 0) i else -i - 1
      p < sorted.length && sorted(p) <= mx
    }
    val pr = VersionedTable.readTaggedPruned(spark, indexDir, "gc", keep)
    System.err.println(s"[gateprobe] prune ${pr.nScanned}/${pr.nLive}")
    t("stored cells scan only")(pr.df.count())
    val pairs = pr.df.select(col("vec_id").as("stored_id"), col("ck"))
      .join(bc.toDF("new_id", "ck"), Seq("ck"))
      .select(col("stored_id"), col("new_id")).distinct()
    System.err.println("=== pairs plan ===")
    pairs.explain("formatted")
    val nPairs = t("pairs join + distinct")(pairs.count())
    System.err.println(s"[gateprobe] pairs=$nPairs")
    val cos = graft.dedup.Dedup.dot(col("nv"), col("sv")) /
      (col("nnrm") * col("snrm"))
    val cross = pairs
      .join(VersionedTable.readTagged(spark, indexDir, "gv")
        .select(col("vec_id").as("stored_id"), col("v").as("sv"),
          col("nrm").as("snrm")), "stored_id")
      .join(coded.select(col("vec_id").as("new_id"), col("v").as("nv"),
        col("nrm").as("nnrm")), "new_id")
      .where(cos >= graft.dedup.Dedup.CosineThreshold)
      .select(col("new_id").as("vec_id")).distinct()
    System.err.println("=== cross plan ===")
    cross.explain("formatted")
    val nCross = t("cross full")(cross.count())
    System.err.println(s"[gateprobe] crossDropped=$nCross")
    // fresh stamps every run (wall-clock ids), so the replay guard
    // never short-circuits; THREE sequential batches expose which costs
    // are per-JVM (codegen compile) vs per-batch
    val all = spark.read.parquet(s"$seedSrc/embeddings.parquet")
      .select((col("vec_id") + (1L << 41)).as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .limit(3 * batchRows).localCheckpoint()
    // compile-cost bisection: same filtered lineage coded twice, then a
    // different filter literal — distinguishes janino-compile-per-source
    // from per-evaluation compute
    for (i <- 0 until 2)
      t(s"code filtered(0) pass $i")(
        graft.streaming.StreamingOps.shardedGateCoded(
          all.where(pmod(col("vec_id"), lit(3)) === 0), w).count())
    t("code filtered(1)")(
      graft.streaming.StreamingOps.shardedGateCoded(
        all.where(pmod(col("vec_id"), lit(3)) === 1), w).count())
    locally {
      import org.apache.spark.sql.execution.debug._
      val cg = graft.streaming.StreamingOps.shardedGateCoded(
        all.where(pmod(col("vec_id"), lit(3)) === 2), w)
      val stats = cg.queryExecution.debug.codegenToSeq()
      stats.foreach { case (_, src, bs) =>
        System.err.println(
          s"[gateprobe] generated code chars=${src.length} stats=$bs")
      }
    }
    val stamp0 = System.nanoTime()
    for (i <- 0 until 3) {
      val b = all.where(pmod(col("vec_id"), lit(3)) === i)
      t(s"full shardedGateBatch #$i")(
        graft.streaming.StreamingOps.shardedGateBatch(b, indexDir, w,
          stamp0 + i))
    }
    spark.stop()
  }
}
