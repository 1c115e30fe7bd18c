package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** The table-maintenance contract: atomic versioned commits, time
  * travel, pruned-rewrite MERGE, value-identical compaction, vacuum,
  * and the optimistic-concurrency conflict rule.
  */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("vtab").toString

  private def rows(dir: String, asOf: Option[Int] = None): Set[(Long, String)] =
    VersionedTable.read(spark, dir, asOf)
      .select("id", "v").as[(Long, String)].collect().toSet

  test("append + time travel: every version reads exactly as committed") {
    val dir = freshDir()
    VersionedTable.append(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "v").repartition(2), dir)
    VersionedTable.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), dir)
    assert(VersionedTable.currentVersion(dir) == 1)
    assert(rows(dir) == Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e"))
    assert(rows(dir, Some(0)) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("merge rewrites only files containing matched keys") {
    val dir = freshDir()
    // two single-row-group files per append → 4 data files, ids spread
    VersionedTable.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .repartition(2, col("id")), dir)
    VersionedTable.append(Seq((3L, "c"), (4L, "d")).toDF("id", "v")
      .repartition(2, col("id")), dir)
    val before = VersionedTable.liveFiles(dir)
    assert(before.size == 4)
    // update id=2, insert id=9 — exactly ONE existing file holds id=2
    VersionedTable.merge(spark, dir,
      Seq((2L, "B!"), (9L, "new")).toDF("id", "v"), Seq("id"))
    assert(rows(dir) ==
      Set(1L -> "a", 2L -> "B!", 3L -> "c", 4L -> "d", 9L -> "new"))
    val hist = VersionedTable.history(spark, dir)
      .orderBy("version").as[(Int, String, Long, Int, Int)].collect()
    assert(hist.map(h => (h._1, h._2)).toSeq ==
      Seq((0, "append"), (1, "append"), (2, "merge")))
    // the merge removed exactly the one touched file; untouched files
    // survive into the new snapshot untouched
    assert(hist(2)._5 == 1)
    val after = VersionedTable.liveFiles(dir)
    assert(before.count(after.contains) == 3)
    // snapshot isolation: the pre-merge version still reads the old value
    assert(rows(dir, Some(1)) ==
      Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("compact is value-identical and shrinks the file count") {
    val dir = freshDir()
    VersionedTable.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .repartition(2), dir)
    VersionedTable.append(Seq((3L, "c")).toDF("id", "v"), dir)
    val expect = rows(dir)
    assert(VersionedTable.liveFiles(dir).size == 3)
    VersionedTable.compact(spark, dir, target = 1)
    assert(VersionedTable.liveFiles(dir).size == 1)
    assert(rows(dir) == expect)
    // time travel across the compaction boundary still works…
    assert(rows(dir, Some(1)) == expect)
    // …until vacuum reclaims the dead files (3 pre-compaction files)
    val deleted = VersionedTable.vacuum(dir)
    assert(deleted.size == 3)
    assert(rows(dir) == expect)
    intercept[Throwable](rows(dir, Some(1)))
  }

  test("racing commits: one winner, one ConflictException") {
    val dir = freshDir()
    VersionedTable.append(Seq((1L, "a")).toDF("id", "v"), dir)
    // a writer picks its version from the snapshot it read…
    val v = VersionedTable.currentVersion(dir) + 1
    // …and a concurrent writer lands that version first (the conflict
    // window between version pick and commit)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_log", f"$v%08d.json"),
      """{"version":1,"op":"append","ts_ms":0,"adds":[],"removes":[]}""" + "\n")
    intercept[VersionedTable.ConflictException] {
      VersionedTable.commit(dir, VersionedTable.Entry(v, "append", 0L,
        Seq("vXXXXXXXX-00000-dead.parquet"), Nil))
    }
    // the loser's commit did not land: state is the racer's version 1,
    // and its phantom file never appears in any snapshot
    assert(VersionedTable.currentVersion(dir) == 1)
    assert(rows(dir) == Set(1L -> "a"))
  }

  test("hasOp survives log checkpoints folding the stamped entry away") {
    // round-14 ADVICE regression: commit() auto-checkpoints every 10th
    // version and the fold REPLACES subsumed entries with one synthetic
    // entry, so a raw `.op` scan over entries() goes blind to every
    // stamp at/before the boundary. hasOp must keep answering true
    // because the checkpoint carries subsumed labels forward.
    val dir = freshDir()
    for (i <- 0 to 12)
      VersionedTable.append(Seq((i.toLong, s"r$i")).toDF("id", "v"), dir,
        op = s"txn-$i")
    // the auto-checkpoint at v10 really fired and really folded: the
    // raw `.op` scan (the pre-fix lookup) no longer sees txn-3
    val es = VersionedTable.entries(dir)
    assert(es.exists(_.op == "checkpoint"))
    assert(!es.exists(_.op == "txn-3"),
      "fixture failed to reproduce the fold — checkpoint did not fire")
    // the checkpoint-proof lookup sees every stamp, folded or live
    for (i <- 0 to 12) assert(VersionedTable.hasOp(dir, s"txn-$i"), s"txn-$i")
    assert(!VersionedTable.hasOp(dir, "txn-13"))
    // a SECOND checkpoint must carry the first one's labels forward too
    for (i <- 13 to 22)
      VersionedTable.append(Seq((i.toLong, s"r$i")).toDF("id", "v"), dir,
        op = s"txn-$i")
    assert(VersionedTable.entries(dir).count(_.op == "checkpoint") == 1)
    for (i <- 0 to 22) assert(VersionedTable.hasOp(dir, s"txn-$i"), s"txn-$i")
  }

  test("appendTagged: one atomic commit, per-group reads, range-chunked point pruning") {
    val dir = freshDir()
    // two logical tables in ONE version: narrow keyed rows chunked by k,
    // and a payload group chunked by id
    val keyed = (0L until 1000L).map(k => (k, k % 7)).toDF("k", "owner")
    val payload = (0L until 100L).map(i => (i, s"p$i")).toDF("id", "p")
    VersionedTable.appendTagged(Seq(
      VersionedTable.TaggedPart("idx", keyed, Some("k"), 8),
      VersionedTable.TaggedPart("dat", payload, Some("id"), 2)),
      dir, op = "genesis")
    assert(VersionedTable.currentVersion(dir) == 0)
    assert(VersionedTable.readTagged(spark, dir, "idx").count() == 1000L)
    assert(VersionedTable.readTagged(spark, dir, "dat").count() == 100L)
    assert(VersionedTable.liveTagged(dir, "idx").size == 8)
    assert(VersionedTable.liveTagged(dir, "dat").size == 2)
    // point-set prune: candidates {3, 901} live in exactly 2 of the 8
    // range-disjoint chunk files
    val cands = Array(3L, 901L)
    val pr = VersionedTable.readTaggedPruned(spark, dir, "idx",
      (mn, mx) => cands.exists(c => c >= mn && c <= mx))
    assert(pr.nLive == 8 && pr.nScanned == 2,
      s"expected 2/8 files scanned, got ${pr.nScanned}/${pr.nLive}")
    // the pruned frame still holds the candidates (prune is file-level;
    // the caller applies the residual predicate)
    val got = pr.df.where(col("k").isin(cands: _*))
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 901L))
    // a second tagged commit appends to both groups atomically
    VersionedTable.appendTagged(Seq(
      VersionedTable.TaggedPart("idx",
        Seq((5000L, 1L)).toDF("k", "owner"), Some("k"), 1),
      VersionedTable.TaggedPart("dat",
        Seq((200L, "p200")).toDF("id", "p"), Some("id"), 1)),
      dir, op = "delta")
    assert(VersionedTable.readTagged(spark, dir, "idx").count() == 1001L)
    assert(VersionedTable.readTagged(spark, dir, "dat").count() == 101L)
    // time travel per group
    assert(VersionedTable.readTagged(spark, dir, "idx", Some(0))
      .count() == 1000L)
  }

  test("truncate empties the table; appends resume; stamp is replayable") {
    val dir = freshDir()
    VersionedTable.append(Seq((1L, "a")).toDF("id", "v"), dir, op = "b-0")
    VersionedTable.truncate(dir, op = "clear-0")
    assert(VersionedTable.liveFiles(dir).isEmpty)
    assert(VersionedTable.hasOp(dir, "clear-0"))
    VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), dir, op = "b-1")
    assert(rows(dir) == Set(2L -> "b"))
    // history intact: the pre-truncate version still time-travels
    assert(rows(dir, Some(0)) == Set(1L -> "a"))
  }
}
