package graft

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.relational.Temporal
import graft.sources.TableQueries

/** Interval join, incremental-MV maintenance, and the versioned-table
  * time-travel audit, each checked against a driver-side brute-force
  * replay over the sf0.001 fixtures (1k events / 50 docs — small enough
  * to recompute exactly in Scala, independent of the declared plans).
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def eventsUs(): Array[(Long, Long)] =
    Tables.load(spark, sf, "events")
      .select(expr("ts_ns div 1000"), col("user_id"))
      .as[(Long, Long)].collect()

  test("intervalJoin: bucketized equi-join equals the brute-force range match") {
    val ev = eventsUs()
    val got = Temporal.intervalJoin(spark, sf)
      .select("w_id", "n_events", "n_users")
      .as[(Long, Long, Long)].collect().toSeq
    val expected = (0L until Temporal.NWindows.toLong).map { k =>
      val lo = Temporal.GridOriginUs + k * Temporal.WindowEveryUs
      val hit = ev.filter { case (ts, _) => ts >= lo && ts < lo + Temporal.WindowLenUs }
      (k, hit.length.toLong, hit.map(_._2).distinct.length.toLong)
    }
    assert(got == expected)
    // the fixture grid really exercises both branches
    assert(got.exists(_._2 > 0) && got.exists(_._2 == 0))
  }

  test("intervalJoin: windows are disjoint so every event matches at most once") {
    val total = Temporal.intervalJoin(spark, sf)
      .agg(sum("n_events")).as[Long].head()
    val ev = eventsUs()
    val inAny = ev.count { case (ts, _) =>
      val k = (ts - Temporal.GridOriginUs) / Temporal.WindowEveryUs
      ts >= Temporal.GridOriginUs + k * Temporal.WindowEveryUs &&
        ts < Temporal.GridOriginUs + k * Temporal.WindowEveryUs + Temporal.WindowLenUs &&
        k >= 0 && k < Temporal.NWindows
    }
    assert(total == inAny.toLong)
  }

  test("mvIncremental: base ⊕ delta merge equals a full recompute") {
    val full = Tables.load(spark, sf, "events")
      .select(col("event_type"), expr("ts_ns div 1000").as("ts_us"),
        col("user_id"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .as[(String, Long, Long, Long)].collect()
    val expected = full.groupBy { case (t, ts, _, _) => (t, ts / 86400000000L) }
      .map { case ((t, day), rows) =>
        (t, day, rows.length.toLong, rows.map(_._3).distinct.length.toLong,
          rows.map(_._4).sum)
      }.toSeq.sortBy(r => (r._1, r._2))
    val got = Temporal.mvIncremental(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the cutoff splits the fixture non-trivially (both legs non-empty)
    val n = Tables.load(spark, sf, "events")
      .select(expr("ts_ns div 1000").as("ts_us"))
      .agg(sum(when(col("ts_us") < Temporal.MvCutoffUs, 1L).otherwise(0L)),
        sum(when(col("ts_us") >= Temporal.MvCutoffUs, 1L).otherwise(0L)))
      .as[(Long, Long)].head()
    assert(n._1 > 0 && n._2 > 0)
  }

  test("appendChunked + readPruned: stats skip files, result is lossless") {
    import graft.sources.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("skipfix").toString
    val d = spark.range(0, 100).select(col("id").as("k"), (col("id") * 7).as("v"))
    VersionedTable.appendChunked(spark, d, dir, "k", nChunks = 4)
    val e = VersionedTable.entries(dir).head
    // one file per chunk, stats parallel to adds and exact
    assert(e.adds.size == 4 && e.mins.size == 4 && e.maxs.size == 4)
    assert(e.mins.sorted == Seq(0L, 25L, 50L, 75L))
    assert(e.maxs.sorted == Seq(24L, 49L, 74L, 99L))
    // [30, 60] intersects chunks 1 and 2 only
    val pr = VersionedTable.readPruned(spark, dir, 30L, 60L)
    assert(pr.nLive == 4 && pr.nScanned == 2)
    val got = pr.df.where(col("k").between(30, 60))
      .as[(Long, Long)].collect().toSet
    assert(got == (30L to 60L).map(k => (k, k * 7)).toSet)
    // a file committed WITHOUT stats is conservatively scanned
    VersionedTable.append(Seq((200L, 1400L)).toDF("k", "v"), dir)
    val pr2 = VersionedTable.readPruned(spark, dir, 30L, 60L)
    assert(pr2.nLive == 5 && pr2.nScanned == 3)
  }

  test("retention-window vacuum preserves time travel inside the window") {
    import graft.sources.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("retfix").toString
    VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), dir)          // v0
    VersionedTable.append(Seq((2L, "b")).toDF("k", "v"), dir)          // v1
    VersionedTable.merge(spark, dir,
      Seq((1L, "A!")).toDF("k", "v"), Seq("k"))                        // v2
    VersionedTable.compact(spark, dir)                                 // v3
    val dead = VersionedTable.vacuum(dir, retainFrom = 2)
    assert(dead.nonEmpty)
    // v2 and v3 still read exactly; v0/v1 files may be gone
    val at2 = VersionedTable.read(spark, dir, Some(2))
      .as[(Long, String)].collect().toSet
    val at3 = VersionedTable.read(spark, dir, Some(3))
      .as[(Long, String)].collect().toSet
    assert(at2 == Set(1L -> "A!", 2L -> "b") && at3 == at2)
    // v2's rewrite kept v1's untouched file alive, so only v0's original
    // (rewritten by the merge) is reclaimable at retainFrom=2
    assert(VersionedTable.liveFiles(dir, Some(2)).forall(f =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, f))))
  }

  test("log checkpoint: folded reads match, pre-checkpoint travel falls back") {
    import graft.sources.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("cpfix").toString
    VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), dir)          // v0
    VersionedTable.append(Seq((2L, "b")).toDF("k", "v"), dir)          // v1
    VersionedTable.merge(spark, dir,
      Seq((1L, "A!")).toDF("k", "v"), Seq("k"))                        // v2
    val before = VersionedTable.read(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(VersionedTable.checkpoint(dir) == 2)
    // the checkpointed view resolves from ONE synthetic entry + tail
    assert(VersionedTable.entries(dir).head.op == "checkpoint")
    assert(VersionedTable.read(spark, dir)
      .as[(Long, String)].collect().toSet == before)
    // commits after the checkpoint fold on top of it
    VersionedTable.append(Seq((3L, "c")).toDF("k", "v"), dir)          // v3
    assert(VersionedTable.read(spark, dir)
      .as[(Long, String)].collect().toSet == before + (3L -> "c"))
    // time travel BEFORE the checkpoint uses the retained JSON history
    assert(VersionedTable.read(spark, dir, Some(0))
      .as[(Long, String)].collect().toSet == Set(1L -> "a"))
    // stats survive the fold: a chunked table checkpoints then prunes
    val dir2 = java.nio.file.Files.createTempDirectory("cpfix2").toString
    VersionedTable.appendChunked(spark,
      spark.range(0, 100).select(col("id").as("k"), col("id").as("v")),
      dir2, "k", nChunks = 4)
    VersionedTable.checkpoint(dir2)
    val pr = VersionedTable.readPruned(spark, dir2, 30L, 60L)
    assert(pr.nLive == 4 && pr.nScanned == 2)
  }

  test("auto-checkpoint: a 100-commit table's snapshot read parses O(10) entries") {
    import graft.sources.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("autocp").toString
    // raw log commits (no Spark write jobs): the property under test is
    // log-read cost, which depends only on the entry files
    for (v <- 0 to 99)
      VersionedTable.commit(dir,
        VersionedTable.Entry(v, "append", 1000L + v, Seq(s"f$v.parquet"),
          if (v >= 50) Seq(s"f${v - 50}.parquet") else Nil))
    // commit() auto-checkpointed at v10, 20, …, 90 — without any caller
    // ever invoking checkpoint() — so a fresh snapshot read parses the
    // latest fold + the ≤CheckpointInterval tail, never the 100 entries
    val before = VersionedTable.entriesParsed.get()
    val es = VersionedTable.entries(dir)
    val parsed = VersionedTable.entriesParsed.get() - before
    assert(parsed <= VersionedTable.CheckpointInterval + 1,
      s"snapshot read parsed $parsed entries — checkpoint not engaged")
    assert(es.head.op == "checkpoint" && es.last.version == 99)
    // the folded view is exactly the unfolded one: adds 50..99 are live
    assert(VersionedTable.liveFiles(dir).sorted ==
      (50 to 99).map(v => s"f$v.parquet").sorted)
    // time travel before the earliest surviving fold still works
    assert(VersionedTable.liveFiles(dir, Some(3)).sorted ==
      (0 to 3).map(v => s"f$v.parquet").sorted)
  }

  test("schema evolution: merged reads surface late columns as nulls") {
    import graft.sources.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("evofix").toString
    VersionedTable.append(Seq((1L, "a")).toDF("k", "v"), dir)
    VersionedTable.append(
      Seq((2L, "b", 9L)).toDF("k", "v", "extra"), dir)
    val merged = VersionedTable.read(spark, dir, mergeSchema = true)
    assert(merged.columns.toSet == Set("k", "v", "extra"))
    assert(merged.orderBy("k").select("k", "extra")
      .as[(Long, Option[Long])].collect().toSeq ==
      Seq(1L -> None, 2L -> Some(9L)))
  }

  test("timeTravel: every lifecycle snapshot reads as committed") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    def stats(rows: Seq[(Long, Long)]): (Long, Long, Long) =
      (rows.length.toLong, rows.map(_._1).sum, rows.map(_._2).sum)
    val a = docs.filter(_._1 % 3 == 0).toSeq
    val ab = docs.filter(r => r._1 % 3 == 0 || r._1 % 3 == 1).toSeq
    val merged = ab.map { case (id, c) =>
      (id, if (id % 6 == 0) c + 1000L else c) }
    val expected = Seq(
      (0L, "append") -> stats(a),
      (1L, "append") -> stats(ab),
      (2L, "merge") -> stats(merged),
      (3L, "compact") -> stats(merged),
      (4L, "vacuum") -> stats(merged))
    val got = TableQueries.timeTravel(spark, sf)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5)))
    assert(got == expected)
  }
}
