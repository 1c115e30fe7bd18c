package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Tables

/** Declared-query surface for [[VersionedTable]] — the table-format
  * lifecycle as an oracle-checked operator rather than only a spec.
  * `VersionedTableSpec` proves the mechanics (atomic commits, conflict
  * losers, snapshot isolation, pruned merge rewrites); this query proves
  * the VALUES: every retained version of a table that went through
  * append → append → merge → compact → vacuum reads back exactly as
  * committed, hash-gated against an oracle that recomputes each snapshot
  * from the source-of-truth parquet.
  */
object TableQueries {

  /** Time-travel audit over a full table lifecycle. Builds a throwaway
    * versioned table from deterministic slices of `documents`:
    *
    *   v0 append   docs with doc_id % 3 = 0        (cols: doc_id, source, n_chars)
    *   v1 append   docs with doc_id % 3 = 1
    *   v2 merge    doc_id % 6 = 0 rows get n_chars + 1000 (keyed upsert)
    *   v3 compact  value-identical rewrite
    *      vacuum   drops files dead at the CURRENT version
    *
    * then reads every version via the log fold and emits one summary row
    * per snapshot — (version, op, n_rows, id_sum, chars_sum) — plus a
    * final "vacuum" row re-reading the current version AFTER physical
    * cleanup (proving vacuum never touches live files). The per-snapshot
    * aggregates run as distributed scans over the snapshot's file list;
    * only the five result rows come to the driver (the bounded-driver-
    * formatting precedent), so the temp table can be deleted before the
    * query returns. 100 TB: snapshot reads are metadata-pruned file
    * lists, the merge rewrites only key-matched files, compaction is
    * value-invariant — each property is what makes a PB-scale corpus
    * table maintainable, and each is what a row here asserts.
    */
  def timeTravel(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_tt").toString
    try {
      val d = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      VersionedTable.append(d.where(col("doc_id") % 3 === 0), tmp)
      VersionedTable.append(d.where(col("doc_id") % 3 === 1), tmp)
      val updates = d.where(col("doc_id") % 6 === 0)
        .withColumn("n_chars", col("n_chars") + 1000L)
      VersionedTable.merge(spark, tmp, updates, Seq("doc_id"))
      VersionedTable.compact(spark, tmp)

      def snap(v: Int): Row = {
        val r = VersionedTable.read(spark, tmp, Some(v))
          .agg(count(lit(1)).as("n_rows"), sum("doc_id").as("id_sum"),
            sum("n_chars").as("chars_sum"))
          .head()
        Row(v.toLong, opOf(tmp, v), r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val versioned = (0 to 3).map(snap)
      VersionedTable.vacuum(tmp)
      val afterVacuum = {
        val r = VersionedTable.read(spark, tmp)
          .agg(count(lit(1)), sum("doc_id"), sum("n_chars")).head()
        Row(4L, "vacuum", r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val schema = StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("op", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("id_sum", LongType, nullable = false),
        StructField("chars_sum", LongType, nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(versioned :+ afterVacuum, 1), schema)
        .orderBy("version")
    } finally deleteRecursively(tmp)
  }

  /** Data-skipping audit — the per-file min/max statistics path
    * ([[VersionedTable.appendChunked]] + [[VersionedTable.readPruned]])
    * exercised end-to-end and hash-gated: documents are range-carved into
    * 8 files on doc_id with exact per-file [min, max] recorded in the
    * commit log, then a mid-range predicate (≈ chunks 3–4) reads through
    * the pruned path. Output is one row: live vs scanned file counts
    * (the metadata-only skip decision — the oracle RE-DERIVES both from
    * the same chunk arithmetic over the raw table, so file-level pruning
    * itself is value-checked, not just spec'd) plus the result aggregate
    * over the surviving rows (proving pruning lost nothing). 100 TB:
    * this is why a point/range query on a PB table costs two files, not
    * a scan — stats live in the log, the skip decision touches no data.
    */
  def skipping(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft_skip").toString
    try {
      val d = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      VersionedTable.appendChunked(spark, d, tmp, "doc_id", nChunks = 8)
      val maxId = d.agg(max("doc_id")).head().getLong(0)
      val step = (maxId + 8) / 8
      val (lo, hi) = (3 * step + step / 2, 5 * step - 1)
      val pr = VersionedTable.readPruned(spark, tmp, lo, hi)
      val r = pr.df.where(col("doc_id").between(lo, hi))
        .agg(count(lit(1)), sum("doc_id"), sum("n_chars")).head()
      val schema = StructType(Seq(
        StructField("n_files", LongType, nullable = false),
        StructField("n_scanned", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("id_sum", LongType, nullable = false),
        StructField("chars_sum", LongType, nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(pr.nLive.toLong,
          pr.nScanned.toLong, r.getLong(0), r.getLong(1), r.getLong(2))), 1),
        schema)
    } finally deleteRecursively(tmp)
  }

  val skippingSql: String =
    """WITH s AS (SELECT (max(doc_id) + 8) // 8 AS step FROM documents),
        b AS (SELECT 3 * step + step // 2 AS lo, 5 * step - 1 AS hi FROM s),
        c AS (SELECT doc_id // (SELECT step FROM s) AS chunk,
               min(doc_id) AS mn, max(doc_id) AS mx
              FROM documents GROUP BY 1)
       SELECT
         (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_files,
         (SELECT CAST(count(*) AS BIGINT) FROM c, b
           WHERE c.mx >= b.lo AND c.mn <= b.hi) AS n_scanned,
         (SELECT CAST(count(*) AS BIGINT) FROM documents, b
           WHERE doc_id BETWEEN b.lo AND b.hi) AS n_rows,
         (SELECT CAST(sum(doc_id) AS BIGINT) FROM documents, b
           WHERE doc_id BETWEEN b.lo AND b.hi) AS id_sum,
         (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents, b
           WHERE doc_id BETWEEN b.lo AND b.hi) AS chars_sum"""

  private def opOf(dir: String, v: Int): String =
    VersionedTable.entries(dir).find(_.version == v).map(_.op).getOrElse("?")

  private def deleteRecursively(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator.asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
  }

  /** Oracle: each snapshot recomputed from `documents` directly —
    * v0/v1 are the modular slices, v2/v3/vacuum are the merged state
    * with the % 6 = 0 update applied.
    */
  val timeTravelSql: String = {
    val merged =
      """SELECT doc_id,
           n_chars + CASE WHEN doc_id % 6 = 0 THEN 1000 ELSE 0 END AS n_chars
         FROM documents WHERE doc_id % 3 IN (0, 1)"""
    def agg(version: Int, op: String, src: String): String =
      s"""SELECT CAST($version AS BIGINT) AS version, '$op' AS op,
            count(*) AS n_rows,
            CAST(sum(doc_id) AS BIGINT) AS id_sum,
            CAST(sum(n_chars) AS BIGINT) AS chars_sum
          FROM ($src)"""
    Seq(
      agg(0, "append", "SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 0"),
      agg(1, "append", "SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 IN (0, 1)"),
      agg(2, "merge", merged),
      agg(3, "compact", merged),
      agg(4, "vacuum", merged)).mkString(" UNION ALL ") +
      " ORDER BY version"
  }
}
