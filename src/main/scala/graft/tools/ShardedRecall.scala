package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnostic: measured design-point RECALL of the SHARDED embedding
  * near-dup index vs the FLAT (table-capped) form on a planted corpus
  * past the flat guarantee's 5·10⁵-vector boundary — the number behind
  * the round-12 sharded-index contract (SURVEY §9), plus the pair-volume
  * bill the sharding pays for it.
  *
  * Ground truth is [[graft.tools.EmbedAmplify]]'s planted pair table
  * with cosines recomputed EXACTLY from the stored floats (the plant is
  * only the generator), filtered to the ≥ NearDupCosine guarantee band
  * and reported per cosine sub-band. Brute force is impossible here by
  * design (10⁶ vectors ≈ 5·10¹¹ pairs) — that is the point: this is the
  * regime the sharding exists for, and planted truth is how recall
  * stays measurable in it.
  *
  * The cost bill is measured as bucket-level candidate PAIR-SLOTS
  * (Σ c·(c−1)/2 over join-key cells — the exact number of cosine
  * evaluations the self-join performs), counted from occupancy alone so
  * the probe itself never joins anything wide, plus the wall seconds of
  * each full pair job.
  *
  * Usage: runMain graft.tools.ShardedRecall [dir]
  */
object ShardedRecall {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "scaledata/embed1m"
    // multi-GB shuffles: swept, pid-stamped local dirs shared with Bench
    // (round-12 verdict ask #5; see Verify.localShuffleDir)
    val (localDir, _) = graft.Verify.localShuffleDir(32L << 30)
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), localDir)
    import graft.similarity.Similarity
    import graft.dedup.Dedup

    val e = graft.model.Tables.loadSpread(spark, dir, "embeddings", "vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Dedup.dot(col("v"), col("v"))))
    val n = e.count()
    val w = Similarity.lshPlanesFor(n)
    val ps = Similarity.shardedParamsFor(w)
    System.err.println(s"[shardedrecall] dir=$dir n=$n w=$w params=$ps " +
      s"flatTables=${Similarity.lshTablesFor(w)}")

    // exact truth cosines from the stored floats; ≥ NearDupCosine only
    // (the guarantee band — pairs the λ mix scattered below it are not
    // part of the contract under test)
    val t0 = spark.read.parquet(s"$dir/planted_truth.parquet")
    val truth = t0
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("nrm").as("na")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("nrm").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        (Dedup.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .where(col("cos") >= Similarity.NearDupCosine)
      .withColumn("band",
        when(col("cos") >= 0.95, "0.95-1.00")
          .when(col("cos") >= 0.90, "0.90-0.95")
          .when(col("cos") >= 0.85, "0.85-0.90")
          .otherwise("0.80-0.85"))
      .localCheckpoint(true)
    val truthRows = truth.select("vec_a", "vec_b", "band")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    System.err.println(s"[shardedrecall] designBandTruth=${truthRows.length}")

    def pct(num: Long, den: Long): String =
      String.format(java.util.Locale.ROOT, "%.4f",
        Double.box(num.toDouble / math.max(1L, den)))

    def measure(name: String, pairs: DataFrame): Unit = {
      val t0ms = System.nanoTime()
      // found ∩ truth via a broadcast semi-join over the (huge) pair
      // stream — the truth side is tiny, the found side never collects
      val hits = pairs.select("vec_a", "vec_b")
        .join(broadcast(truth.select("vec_a", "vec_b")),
          Seq("vec_a", "vec_b"), "left_semi")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0ms) / 1e9
      val byBand = truthRows.groupBy(_._3).toSeq.sortBy(_._1)
      val tot = truthRows.length.toLong
      val hit = truthRows.count(t => hits.contains((t._1, t._2))).toLong
      System.err.println(String.format(java.util.Locale.ROOT,
        "[shardedrecall] %s: designRecall=%s (%d/%d) wallSec=%.1f",
        name, pct(hit, tot), Long.box(hit), Long.box(tot),
        Double.box(secs)))
      byBand.foreach { case (band, rows) =>
        val h = rows.count(t => hits.contains((t._1, t._2))).toLong
        System.err.println(s"[shardedrecall]   $name band=$band " +
          s"truth=${rows.length} found=$h recall=${pct(h, rows.length)}")
      }
    }

    def bill(name: String, bx: DataFrame, keys: Seq[String]): Unit = {
      val occ = bx.groupBy(keys.map(col): _*).count()
      val st = occ.agg(
        count(lit(1)).as("cells"),
        max("count").as("maxOcc"),
        sum(expr("count * (count - 1) div 2")).as("pairSlots")).head()
      System.err.println(s"[shardedrecall] $name bill: " +
        s"bucketRows=${bx.count()} cells=${st.getLong(0)} " +
        s"maxOcc=${st.getLong(1)} candPairSlots=${st.getLong(2)}")
    }

    // the bill, occupancy-only (narrow rows, no vectors ride this probe)
    val narrow = e.select(col("vec_id"), col("v"), col("nrm"))
    bill("sharded", Similarity.shardedLshBuckets(narrow, ps)
      .select("rep", "shard", "tbl", "bucket"),
      Seq("rep", "shard", "tbl", "bucket"))
    bill("flat", Similarity
      .lshBuckets(narrow, w, Similarity.lshTablesFor(w))
      .select("tbl", "bucket"), Seq("tbl", "bucket"))

    measure("sharded", Similarity.shardedNearDupPairs(spark, dir))
    measure("flat", Similarity.lshNearDupPairs(spark, dir))

    // INCREMENTAL probe recall on the same corpus through an 8:2 HASH
    // split (the declared query's id-residue split never crosses a
    // planted pair here — the amplifier's replica offsets are ≡ 0
    // mod 10), recall over the CROSS-SPLIT subset of the truth (pairs
    // with exactly one side in the new batch — the only pairs the
    // probe is asked to find). The probe runs at the width the STORED
    // 80% fixes, so this measures the contract an ingest pipeline
    // actually gets from q_dedup_embed_sharded_incr past the flat
    // boundary.
    locally {
      import graft.functions.Hashing
      def isNewId(id: Long): Boolean =
        Hashing.h48String(s"incr-$id") % 10 >= 8
      val crossTruth = truthRows.filter(t => isNewId(t._1) != isNewId(t._2))
      System.err.println(
        s"[shardedrecall] crossSplitTruth=${crossTruth.length}")
      val t0ms = System.nanoTime()
      val found = Similarity.shardedIncrementalNearBy(spark, dir,
          Hashing.h48(concat(lit("incr-"), col("vec_id"))) % 10 >= 8)
        .select(least(col("new_id"), col("stored_id")).as("vec_a"),
          greatest(col("new_id"), col("stored_id")).as("vec_b"))
        .join(broadcast(truth.select("vec_a", "vec_b")),
          Seq("vec_a", "vec_b"), "left_semi")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0ms) / 1e9
      val tot = crossTruth.length.toLong
      val hit = crossTruth.count(t => found.contains((t._1, t._2))).toLong
      System.err.println(String.format(java.util.Locale.ROOT,
        "[shardedrecall] incremental: crossRecall=%s (%d/%d) wallSec=%.1f",
        pct(hit, tot), Long.box(hit), Long.box(tot), Double.box(secs)))
      crossTruth.groupBy(_._3).toSeq.sortBy(_._1).foreach {
        case (band, rows) =>
          val h = rows.count(t => found.contains((t._1, t._2))).toLong
          System.err.println(s"[shardedrecall]   incremental band=$band " +
            s"truth=${rows.length} found=$h recall=${pct(h, rows.length)}")
      }
    }

    // WIDTH-MIGRATION cycle (round-12 verdict ask #3's measurement):
    // build the index on HALF the stored split (the corpus at some past
    // ingest point — a narrower frozen width), ingest the other half at
    // the frozen params (graft.similarity.Similarity.shardedIndexAppend
    // — exactly what the admission gate does), confirm the drift check
    // fires, then migrate and measure what each state actually delivers:
    // probe RECALL over the cross-split planted truth AND the
    // candidate-slot BILL (Σ stored×new per cell — the number of cosine
    // evaluations a probe pays). The expected shape: the drifted index
    // KEEPS recall (narrower w ⇒ more collisions) but pays a fattened
    // bill; migration restores the design-point economics at the same
    // guarantee.
    if (args.contains("--migrate")) locally {
      import graft.functions.Hashing
      import graft.similarity.Similarity
      def isNewId(id: Long): Boolean =
        Hashing.h48String(s"incr-$id") % 10 >= 8
      val isNew = Hashing.h48(concat(lit("incr-"), col("vec_id"))) % 10 >= 8
      val stored = e.where(!isNew)
      val fresh = e.where(isNew)
      val migHalf = Hashing.h48(concat(lit("mig-"), col("vec_id"))) % 2
      val idx = java.nio.file.Files.createTempDirectory("mig_idx").toString
      val wSmall = Similarity.shardedIndexBuild(spark,
        stored.where(migHalf === 0), idx)
      Similarity.shardedIndexAppend(spark, idx,
        stored.where(migHalf === 1))
      val d = Similarity.shardedIndexDrift(spark, idx).head()
      System.err.println(s"[shardedrecall] migrate: frozen_w=$wSmall " +
        s"indexed=${d.getLong(1)} current=${d.getLong(2)} " +
        s"fresh_w=${d.getInt(3)} drifted=${d.getBoolean(4)}")
      val crossTruth = truthRows.filter(t => isNewId(t._1) != isNewId(t._2))
      def probeState(path: String, label: String): Unit = {
        val (w, _) = Similarity.shardedIndexMeta(spark, path)
        val ps = Similarity.shardedParamsFor(w)
        // candidate-slot bill from occupancy alone (stored × new per cell)
        val keys = Seq("rep", "shard", "tbl", "bucket")
        val sc = spark.read.parquet(s"$path/buckets")
          .groupBy(keys.map(col): _*).count()
          .withColumnRenamed("count", "n_stored")
        val nc = Similarity.shardedLshBuckets(fresh, ps)
          .groupBy(keys.map(col): _*).count()
          .withColumnRenamed("count", "n_new")
        val billRow = sc.join(nc, keys)
          .agg(sum(expr("n_stored * n_new"))).head()
        val slots = if (billRow.isNullAt(0)) 0L else billRow.getLong(0)
        val t0 = System.nanoTime()
        val found = Similarity.shardedIncrementalFromIndex(spark, path, fresh)
          .select(least(col("new_id"), col("stored_id")).as("vec_a"),
            greatest(col("new_id"), col("stored_id")).as("vec_b"))
          .join(broadcast(truth.select("vec_a", "vec_b")),
            Seq("vec_a", "vec_b"), "left_semi")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val tot = crossTruth.length.toLong
        val hit = crossTruth.count(t => found.contains((t._1, t._2))).toLong
        System.err.println(String.format(java.util.Locale.ROOT,
          "[shardedrecall] migrate %s: w=%d crossRecall=%s (%d/%d) " +
            "candSlots=%d wallSec=%.1f",
          label, Int.box(w), pct(hit, tot), Long.box(hit), Long.box(tot),
          Long.box(slots), Double.box(secs)))
      }
      probeState(idx, "drifted")
      val idx2 = java.nio.file.Files.createTempDirectory("mig_idx2").toString
      val (oldW, newW) = Similarity.shardedIndexMigrate(spark, idx, idx2)
      assert(newW > oldW, s"migration did not widen: $oldW -> $newW")
      probeState(idx2, "migrated")
    }
    spark.stop()
  }
}
