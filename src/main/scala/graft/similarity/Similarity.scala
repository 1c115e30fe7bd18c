package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.dedup.Dedup
import graft.functions.Hashing

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`array<float>` column) — the similarity-search capability the build
  * target mandates for a training-data pipeline.
  *
  * Two paths:
  *  1. [[cosineTopK]] — brute-force exact top-k: one narrow scan computing a
  *     sequential-fold cosine against a broadcast query vector, then
  *     `orderBy().limit(k)` (Spark plans TakeOrderedAndProject — a per-
  *     partition bounded heap + driver merge, no global sort). Correctness
  *     baseline; at 100 TB it is one full scan, embarrassingly parallel.
  *  2. [[annTopK]] — random-hyperplane LSH with OR-amplification: 4 tables
  *     × 4 hyperplanes (16-bucket code per table). Candidates = vectors
  *     sharing ANY table bucket with the query (equi-join on
  *     (table, bucket) — never O(n²)); exact cosine re-rank of candidates.
  *     Hyperplane components are md5-derived rationals in [−1, 1], so the
  *     DuckDB oracle regenerates the identical planes.
  *
  * The query vector is the row with the minimum vec_id — deterministic and
  * scale-independent (no hard-coded id that could vanish at another SF).
  */
object Similarity {

  val K = 10
  val LshTables = 4
  val LshPlanes = 4 // bits per table → 16 buckets/table
  val Dim = 64

  /** Deterministic pseudo-random hyperplane component in [−1, 1]:
    * (h48("rp-t-j-k") mod 2001 − 1000)/1000. DuckDB twin inlined below.
    */
  private def planeRow(t: Int, j: Int): Column = {
    val comps = (0 until Dim).map { k =>
      (Hashing.h48(lit(s"rp-$t-$j-$k")) % 2001 - 1000).cast("double") / 1000.0
    }
    array(comps: _*)
  }

  private def duckPlane(t: Int, j: Int): String = {
    val comps = (0 until Dim)
      .map(k => s"CAST(${Hashing.duckH48(s"'rp-$t-$j-$k'")} % 2001 - 1000 AS DOUBLE)/1000.0")
      .mkString(", ")
    s"[$comps]"
  }

  private def queryVec(e: DataFrame): DataFrame =
    e.orderBy("vec_id").limit(1).select(col("vec_id").as("q_id"), col("v").as("qv"))

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Exact cosine top-k against the min-vec_id query vector.
    * Output: (vec_id, cosine), k rows, cosine desc.
    */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    e.crossJoin(broadcast(queryVec(e)))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), Dedup.cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(K)
  }

  val cosineTopKSql: String =
    s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv FROM e ORDER BY vec_id LIMIT 1)
        SELECT e.vec_id, ${Dedup.duckCosine("e.v", "q.qv")} AS cosine
        FROM e, q WHERE e.vec_id <> q.q_id
        ORDER BY cosine DESC, e.vec_id LIMIT $K"""

  /** LSH bucket codes: for each vector and each LSH table t, the integer
    * Σ_j [dot(plane_{t,j}, v) ≥ 0]·2^j. One narrow projection per vector
    * (planes are literals — broadcast by constant folding), bucket math is
    * integer ⇒ engine-exact.
    */
  def lshBuckets(e: DataFrame): DataFrame = {
    val tables = (0 until LshTables).map { t =>
      val code = (0 until LshPlanes).map { j =>
        when(Dedup.dot(planeRow(t, j), col("v")) >= 0.0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), code.as("bucket"))
    }
    e.select(col("vec_id"), col("v"), explode(array(tables: _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  /** ANN top-k: candidates share ≥1 (table, bucket) with the query, then
    * exact cosine re-rank. Output: (vec_id, cosine) — ≤ k rows.
    */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    val bx = lshBuckets(e)
    val qb = broadcast(lshBuckets(queryVec(e).select(col("q_id").as("vec_id"), col("qv").as("v")))
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("tbl").as("q_tbl"), col("bucket").as("q_bucket")))
    bx.join(qb, col("tbl") === col("q_tbl") && col("bucket") === col("q_bucket")
        && col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), col("v"), col("qv")).distinct()
      .select(col("vec_id"), Dedup.cosine(col("v"), col("qv")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(K)
  }

  val annTopKSql: String = {
    val bucketRows = (for (t <- 0 until LshTables) yield {
      val code = (0 until LshPlanes).map { j =>
        s"(CASE WHEN ${Dedup.duckDot(duckPlane(t, j), "v")} >= 0.0 THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, v, $t AS tbl, $code AS bucket FROM e"
    }).mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv FROM e ORDER BY vec_id LIMIT 1),
        bx AS ($bucketRows),
        qb AS (SELECT b.tbl AS q_tbl, b.bucket AS q_bucket, q.q_id, q.qv
               FROM bx b, q WHERE b.vec_id = q.q_id),
        cand AS (SELECT DISTINCT bx.vec_id, bx.v, qb.qv
                 FROM bx JOIN qb ON bx.tbl = qb.q_tbl
                   AND bx.bucket = qb.q_bucket AND bx.vec_id <> qb.q_id)
        SELECT vec_id, ${Dedup.duckCosine("v", "qv")} AS cosine
        FROM cand ORDER BY cosine DESC, vec_id LIMIT $K"""
  }
}
