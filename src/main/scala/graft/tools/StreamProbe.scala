package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming THROUGHPUT / STATE-SIZE probe (round-11 verdict ask #4):
  * `StreamingSpec` proves semantics (crash-replay, watermark eviction,
  * timer flush) but no throughput or state-growth number existed for any
  * streaming op. This probe drives sf1-scale micro-batches through the
  * four production-shaped streaming pipelines and records, per batch:
  * input rows, wall seconds, micro-batch latency as reported by the
  * engine, and — for the watermark-stateful ops — state rows and state
  * bytes, so the state-growth LAW is measured rather than argued:
  * event time advances one hour per batch under a 2-hour watermark, so
  * state must PLATEAU at ~watermark-window volume (≈3 batches of
  * digests) instead of growing with the stream.
  *
  *   - paragraph_dedup / cdc_dedup: dropDuplicatesWithinWatermark over
  *     block / content-defined-chunk digests of the sf1 documents;
  *   - mv_maintain: exactly-once additive MERGE of event micro-batches
  *     into a VersionedTable (state = the table itself: versions and
  *     on-disk bytes are recorded instead of operator state);
  *   - versioned_ingest: idempotentAppend of document micro-batches
  *     (same on-disk accounting).
  *
  * Output: one JSON line on stdout + BENCH_STREAM_r12.json (path
  * overridable via SPARK_GRAFT_STREAM_OUT).
  *
  * Usage: runMain graft.tools.StreamProbe [sfDir] [nBatches]
  */
object StreamProbe {

  private def fmt(v: Double, dec: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))

  final case class BatchRow(rows: Long, sec: Double, batchMs: Long,
      stateRows: Long, stateMb: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "scaledata/sf1"
    val nBatches = if (args.length > 1) args(1).toInt else 12
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT",
      "BENCH_STREAM_r12.json")
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // one hour of event time per batch — the advancing clock the
    // watermark eviction needs; epoch anchored for determinism
    val hour0 = 1704067200L // 2024-01-01T00:00:00Z, seconds

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .where(col("text").isNotNull)
      .as[(Long, String)].collect().sortBy(_._1)
    val docBatches = docs.zipWithIndex
      .groupBy(_._2 % nBatches).toSeq.sortBy(_._1)
      .map { case (b, rows) =>
        rows.map { case ((id, t), _) =>
          (new Timestamp((hour0 + b * 3600L) * 1000L), id, t) }.toSeq
      }

    val results = scala.collection.mutable.ArrayBuffer[
      (String, Long, Double, Seq[BatchRow], String)]()

    /** Drive the query with per-batch adds; capture engine progress.
      * `extra` is by-name so table-state accounting reads AFTER the run.
      */
    def drive[T](name: String, batches: Seq[Seq[T]],
        mem: MemoryStream[T], start: => StreamingQuery,
        extra: => String = ""): Unit = {
      val q = start
      val rows = scala.collection.mutable.ArrayBuffer[BatchRow]()
      try {
        for (b <- batches) {
          val t0 = System.nanoTime()
          mem.addData(b: _*)
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          // lastProgress may be the empty eviction batch; state totals on
          // it are CURRENT, which is what we want; batch latency comes
          // from the last progress that actually carried input rows
          val ps = q.recentProgress
          val dataP = ps.reverse.find(_.numInputRows > 0)
          val batchMs = dataP
            .flatMap(p => Option(p.durationMs.get("triggerExecution")))
            .map(_.longValue).getOrElse(-1L)
          val st = Option(q.lastProgress)
            .map(_.stateOperators.toSeq).getOrElse(Nil)
          rows += BatchRow(b.size.toLong, sec, batchMs,
            st.map(_.numRowsTotal).sum,
            st.map(_.memoryUsedBytes).sum / 1e6)
        }
      } finally q.stop()
      val totalRows = rows.map(_.rows).sum
      val totalSec = rows.map(_.sec).sum
      results += ((name, totalRows, totalSec, rows.toSeq, extra))
      System.err.println(s"[streamprobe] $name rows=$totalRows " +
        s"sec=${fmt(totalSec, 1)} " +
        s"rows_per_sec=${fmt(totalRows / totalSec, 0)} " +
        s"stateRows=${rows.map(_.stateRows).mkString(",")}")
    }

    // ---- paragraph dedup (watermark-stateful)
    locally {
      val mem = MemoryStream[(Timestamp, Long, String)]
      drive("paragraph_dedup", docBatches, mem,
        graft.streaming.StreamingOps
          .paragraphDedupStream(mem.toDF().toDF("ts", "doc_id", "text"))
          .writeStream.format("noop")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("sp_para").toString)
          .start())
    }

    // ---- CDC chunk dedup (watermark-stateful)
    locally {
      val mem = MemoryStream[(Timestamp, Long, String)]
      drive("cdc_dedup", docBatches, mem,
        graft.streaming.StreamingOps
          .cdcDedupStream(mem.toDF().toDF("ts", "doc_id", "text"))
          .writeStream.format("noop")
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("sp_cdc").toString)
          .start())
    }

    def dirMb(dir: String): Double = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(dir)) / 1e6
    }

    // ---- MV maintenance (foreachBatch merge into a VersionedTable)
    locally {
      // events.ts is TIMESTAMP(NANOS) (read as a raw long under the
      // session's nanosAsLong flag) in the driver testdata, but plain
      // TIMESTAMP in Spark-rewritten amplified dirs — handle both
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      val tsUs = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000")
        case _ => expr("unix_micros(CAST(ts AS TIMESTAMP))")
      }
      val events = raw
        .select(col("event_type"), tsUs.as("ts_us"),
          col("user_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .as[(String, Long, Long, Long)].collect()
      val evBatches = events.zipWithIndex
        .groupBy(_._2 % nBatches).toSeq.sortBy(_._1)
        .map(_._2.map(_._1).toSeq)
      val dir = java.nio.file.Files.createTempDirectory("sp_mv").toString
      val mem = MemoryStream[(String, Long, Long, Long)]
      drive("mv_maintain", evBatches, mem,
        graft.streaming.StreamingOps.mvMaintainStream(
          mem.toDF().toDF("event_type", "ts_us", "user_id", "cents"), dir,
          Some(java.nio.file.Files.createTempDirectory("sp_mvcp").toString)),
        extra = s""","table_versions":${
          graft.sources.VersionedTable.currentVersion(dir) + 1
        },"table_mb":${fmt(dirMb(dir), 2)}""")
    }

    // ---- versioned ingest (foreachBatch idempotentAppend)
    locally {
      val dir = java.nio.file.Files.createTempDirectory("sp_vt").toString
      val mem = MemoryStream[(Timestamp, Long, String)]
      drive("versioned_ingest", docBatches, mem,
        graft.streaming.StreamingOps.versionedIngest(
          mem.toDF().toDF("ts", "doc_id", "text"), dir,
          Some(java.nio.file.Files.createTempDirectory("sp_vtcp").toString)),
        extra = s""","table_versions":${
          graft.sources.VersionedTable.currentVersion(dir) + 1
        },"table_mb":${fmt(dirMb(dir), 2)}""")
    }

    // ---- sharded near-dup ingest gate (foreachBatch probe + append);
    // state = the single-table index itself: versions, on-disk bytes and
    // the ADMISSION count (rows that survived both dedup gates) — the
    // rows/s here prices the full gate (code + within-batch dedup +
    // cross-index probe + commit) per arriving vector
    locally {
      val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        .as[(Long, Array[Double])].collect().sortBy(_._1)
      val vecBatches = vecs.zipWithIndex
        .groupBy(_._2 % nBatches).toSeq.sortBy(_._1)
        .map(_._2.map(_._1).toSeq)
      val w = graft.similarity.Similarity.lshPlanesFor(vecs.length.toLong)
      val dir = java.nio.file.Files.createTempDirectory("sp_gate").toString
      val mem = MemoryStream[(Long, Array[Double])]
      drive("sharded_gate", vecBatches, mem,
        graft.streaming.StreamingOps.shardedGateStream(
          mem.toDF().toDF("vec_id", "embedding"), dir, w,
          Some(java.nio.file.Files.createTempDirectory("sp_gatecp").toString)),
        extra = s""","table_versions":${
          graft.sources.VersionedTable.currentVersion(dir) + 1
        },"table_mb":${fmt(dirMb(dir), 2)},"admitted":${
          graft.sources.VersionedTable.read(spark, dir).count()
        },"width":$w""")
    }

    val opsJson = results.map { case (name, rows, sec, batches, extra) =>
      val bj = batches.map(b =>
        s"""{"rows":${b.rows},"sec":${fmt(b.sec, 3)},"batch_ms":${b.batchMs
        },"state_rows":${b.stateRows},"state_mb":${fmt(b.stateMb, 2)}}""")
        .mkString("[", ",", "]")
      s""""$name":{"rows_in":$rows,"total_sec":${fmt(sec, 2)
      },"rows_per_sec":${fmt(rows / sec, 0)}$extra,"batches":$bj}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"stream_probe","sf":"$sfDir","n_batches":$nBatches,"watermark":"2 hours","hours_per_batch":1,"ops":$opsJson}"""
    println(line)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "."), outPath)
    java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
