package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pair-volume LAW + pruning-quality probe for the SHARDED semantic
  * dedup (round-12 verdict ask #1's "done" evidence): on an
  * [[graft.tools.EmbedAmplify]] corpus — including sizes PAST the
  * 8.4M-vector cap where the single-level adaptive-C form
  * ([[graft.similarity.Similarity.semClustersFor]]) goes quadratic —
  * measures, from (shard, cluster) OCCUPANCY alone (the exact count of
  * cosine evaluations the within-cluster pair join performs; the probe
  * itself never joins pairs):
  *
  *   - the SHARDED form's pair slots and slots-per-vector (the law under
  *     test: ≈ SemClusterTarget/2 ≈ 1024, FLAT in n);
  *   - the UNSHARDED capped form's pair slots at the same n (the law it
  *     replaces: slots/vector ≈ n / (2 · 4096), LINEAR in n past the
  *     cap — quadratic total);
  *   - ghost-band cost: memberships / n (the sharding's entire bill);
  *   - pruning QUALITY on the amplifier's planted truth: the fraction of
  *     planted near-dup pairs whose two ends share a (shard, cluster)
  *     cell — the co-cell rate IS SemDeDup's catch ceiling, so
  *     sharded-vs-unsharded co-cell deltas measure exactly what the
  *     routing cut + ghost band lose or keep. (Both forms are
  *     cluster-granular approximations by design — the audit is
  *     relative, per cosine band.)
  *
  * Usage: runMain graft.tools.SemShardProbe [dir] [--sharded-only]
  * (`--sharded-only` skips the unsharded twin where its assignment pass
  * is the only quadratic-cost job on the box; `--unsharded-only` skips
  * the sharded side instead — the round-14 eps(S) re-measurement ran
  * the sharded sweep first and backfilled the unsharded baseline).
  */
object SemShardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.filterNot(_.startsWith("--"))
      .getOrElse("scaledata/embed1m")
    val shardedOnly = args.contains("--sharded-only")
    val unshardedOnly = args.contains("--unsharded-only")
    // contradictory flags would otherwise INVERT --sharded-only (the
    // `shardedOnly && !unshardedOnly` guard below turns false and the
    // unsharded twin runs) — round-14 ADVICE: reject up front
    require(!(shardedOnly && unshardedOnly),
      "--sharded-only and --unsharded-only are mutually exclusive")
    // ε-menu mode (round-14 verdict ask #6): ALSO price the
    // quality-first FIXED ghost band (ε = SemGhostMargin, the round-13
    // setting) next to the default cost-first ε(S) law, so both
    // (cost, catch) curves land in one committed record
    val bothEps = args.contains("--both-eps")
    val (localDir, _) = graft.Verify.localShuffleDir(32L << 30)
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), localDir)
    import graft.similarity.Similarity
    import graft.dedup.Dedup

    val e = graft.model.Tables.loadSpread(spark, dir, "embeddings", "vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Dedup.dot(col("v"), col("v"))))
    val n = e.count()
    val s = Similarity.semShardsFor(n)

    def fmt(v: Double): String = String.format(
      java.util.Locale.ROOT, "%.4f", Double.box(v))

    /** (cells, pair slots, memberships, wall sec) from a (shard, cid)
      * membership frame — occupancy only, nothing wide moves. */
    def occupancy(name: String, asg: DataFrame): (Long, Long, Long, Double) = {
      val t0 = System.nanoTime()
      val st = asg.groupBy("shard", "cid").count()
        .agg(count(lit(1)), sum(expr("count * (count - 1) div 2")),
          sum("count")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val (cells, slots, mems) = (st.getLong(0), st.getLong(1), st.getLong(2))
      System.err.println(s"[semshard] $name: n=$n cells=$cells " +
        s"pairSlots=$slots slotsPerVec=${fmt(slots.toDouble / n)} " +
        s"memberships=$mems wallSec=${fmt(sec)}")
      (cells, slots, mems, sec)
    }

    val sharded = Similarity.semShardedAssign(e, s)
      .select("vec_id", "shard", "cid")
    val (shSlots, shMems, shSec) =
      if (unshardedOnly) (0L, 0L, 0.0)
      else {
        val (_, a, b, c) = occupancy(s"sharded(S=$s)", sharded)
        (a, b, c)
      }
    // the quality-first fixed-ε twin of the same construction
    val shardedFx =
      if (bothEps && !unshardedOnly)
        Some(Similarity.semShardedAssign(e, s,
          Some(Similarity.SemGhostMargin)).select("vec_id", "shard", "cid"))
      else None
    val fx = shardedFx.map { f =>
      val (_, a, b, c) = occupancy(s"sharded_fixed_eps(S=$s)", f)
      (a, b, c)
    }

    // unsharded capped twin: one centroid set at the capped width, the
    // same largest-vec_id convention — the construction the sharding
    // replaces past 8.4M vectors
    val c = Similarity.semClustersFor(n)
    val unsharded = if (shardedOnly && !unshardedOnly) None else Some {
      val cents = e.orderBy(col("vec_id").desc).limit(c).select(col("v"))
        .collect().map { r =>
          val v = r.getSeq[Double](0).toArray
          var d = 0.0; v.foreach(x => d += x * x)
          (v, math.sqrt(d))
        }
      val cid = org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.NearestCentroid(
          org.apache.spark.sql.GraftSqlBridge.expression(col("v")),
          cents.flatMap(_._1).toIndexedSeq,
          cents.map(_._2).toIndexedSeq, Similarity.Dim))
      e.select(col("vec_id"), lit(0).as("shard"), cid.as("cid"))
    }
    val un = unsharded.map(u => occupancy(s"unsharded(C=$c)", u))

    // planted-truth co-cell quality (EmbedAmplify corpora only)
    val truthPath = s"$dir/planted_truth.parquet"
    val hasTruth = try {
      java.nio.file.Files.exists(java.nio.file.Paths.get(truthPath))
    } catch { case _: Throwable => false }
    val quality = if (!hasTruth) "" else {
      val t0 = spark.read.parquet(truthPath)
      val truth = t0
        .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"),
          col("nrm").as("na")), "vec_a")
        .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
          col("nrm").as("nb")), "vec_b")
        .select(col("vec_a"), col("vec_b"),
          (Dedup.dot(col("va"), col("vb")) / (col("na") * col("nb")))
            .as("cos"))
        .withColumn("band",
          when(col("cos") >= 0.95, "0.95-1.00")
            .when(col("cos") >= 0.90, "0.90-0.95")
            .when(col("cos") >= 0.85, "0.85-0.90")
            .when(col("cos") >= 0.80, "0.80-0.85")
            .otherwise("below"))
        .localCheckpoint(true)
      def coCell(name: String, asg: DataFrame): Map[String, (Long, Long)] = {
        val hit = truth
          .join(asg.select(col("vec_id").as("vec_a"), col("shard"),
            col("cid")), "vec_a")
          .join(asg.select(col("vec_id").as("vec_b"),
            col("shard").as("shard_b"), col("cid").as("cid_b")), "vec_b")
          .where(col("shard") === col("shard_b")
            && col("cid") === col("cid_b"))
          .select("vec_a", "vec_b", "band").distinct()
          .groupBy("band").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val tot = truth.groupBy("band").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val out = tot.map { case (b, t) => b -> ((hit.getOrElse(b, 0L), t)) }
        out.toSeq.sortBy(_._1).foreach { case (b, (h, t)) =>
          System.err.println(s"[semshard] $name coCell band=$b $h/$t " +
            s"= ${fmt(h.toDouble / math.max(1L, t))}")
        }
        out
      }
      val sq = if (unshardedOnly) Map.empty[String, (Long, Long)]
        else coCell("sharded", sharded)
      val fq = shardedFx.map(f => coCell("sharded_fixed_eps", f))
        .getOrElse(Map.empty)
      val uq = unsharded.map(u => coCell("unsharded",
        u.select("vec_id", "shard", "cid")))
      val bands0 = if (sq.nonEmpty) sq else
        uq.getOrElse(Map.empty).map { case (b, (_, t2)) => b -> ((-1L, t2)) }
      val bands = bands0.toSeq.sortBy(_._1).map { case (b, (h, t)) =>
        val u = uq.flatMap(_.get(b)).map(_._1)
        val f = fq.get(b).map(_._1)
        s""""$b":{"truth":$t${
          if (h >= 0) s""","sharded":$h""" else ""}${
          f.map(x => s""","sharded_fixed_eps":$x""").getOrElse("")}${
          u.map(x => s""","unsharded":$x""").getOrElse("")}}"""
      }.mkString(",")
      s""","planted_cocell":{$bands}"""
    }

    println(s"""{"metric":"semshard","dir":"$dir","n":$n,"s":$s,""" +
      s""""sharded_slots":$shSlots,"sharded_slots_per_vec":${
        fmt(shSlots.toDouble / n)},"memberships":$shMems,""" +
      s""""ghost_pct":${fmt((shMems - n).toDouble / n * 100)},""" +
      s""""assign_wall_sec":${fmt(shSec)},"unsharded_c":$c""" +
      fx.map { case (slots, mems, sec) =>
        s""","fixed_eps_slots":$slots,"fixed_eps_slots_per_vec":${
          fmt(slots.toDouble / n)},"fixed_eps_memberships":$mems,""" +
        s""""fixed_eps_ghost_pct":${fmt((mems - n).toDouble / n * 100)},""" +
        s""""fixed_eps_wall_sec":${fmt(sec)}"""
      }.getOrElse("") +
      un.map { case (_, slots, _, sec) =>
        s""","unsharded_slots":$slots,"unsharded_slots_per_vec":${
          fmt(slots.toDouble / n)},"unsharded_wall_sec":${fmt(sec)}"""
      }.getOrElse("") + quality + "}")
    spark.stop()
  }
}
