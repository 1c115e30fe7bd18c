package graft.pipeline

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Verify
import graft.model.{PipelineCounters, RefFormats, Tables}
import graft.wordcount.WordCount
import graft.chisq.ChiSquare

/** End-to-end CLI — the engine's replacement for the reference's
  * `src/main.sh` orchestration (reference `src/main.sh:89-191`): one Spark
  * driver program, one lazy DAG, no intermediate text materialization
  * between "jobs" (job-1's output parquet is a product artifact that the
  * χ² stage then reuses instead of recomputing the tokenization).
  *
  * Usage: graft.Main <reviews.json> <stopwords.txt> <outDir> [k=75]
  *
  * Outputs under <outDir>:
  *   counters.txt        single line `<total> {'cat': n, ...}` (reference
  *                       `src/wordCountWrapper.py:49-50` format)
  *   wordcount/          parquet (word, category, df_count) — canonical
  *                       form of the reference's job-1 part files
  *   chisq/              parquet (category, word, chi2) top-k rows
  *   chisq.txt           RawProtocol parity lines `Cat\t{'w': χ², ...}` +
  *                       final sorted-vocabulary line (reference
  *                       `src/chiSquaredJob.py:110-127`)
  */
object Main {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: graft.Main <reviews.json> <stopwords.txt> <outDir> [k=75]")
    val k = if (args.length > 3) args(3).toInt else 75
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try run(spark, args(0), args(1), args(2), k)
    finally spark.stop()
  }

  def run(spark: SparkSession, input: String, stopPath: String,
      outDir: String, k: Int = 75): PipelineCounters = {
    val counters = PipelineCounters(spark)
    // stopword side input: tiny file read driver-side, broadcast by the
    // InSet filter (reference ships it via distributed cache); on failure
    // continue with an empty set + advisory counter (reference
    // `src/wordCountJob.py:46-48`)
    val stopwords: Set[String] =
      try Files.readAllLines(Paths.get(stopPath)).asScala
        .map(_.trim).filter(_.nonEmpty).toSet
      catch { case _: Exception =>
        counters.stopwordLoadFailures.add(1L)
        Set.empty
      }

    val reviews = Tables.reviews(spark, input, Some(counters))
    val pruned = reviews
      .select(col("reviewText").as("text"), col("category")).persist()
    try {
      // counters: exact actions on the cached parse (NOT accumulators —
      // those double-count on task retry)
      val catTotals = WordCount.categoryTotals(pruned, col("category"))
      val catMap = catTotals.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = catMap.values.sum
      RefFormats.writeCounters(s"$outDir/counters.txt", total, catMap)

      val df = WordCount.documentFrequency(
        pruned, col("text"), col("category"), stopwords)
      df.write.mode("overwrite").parquet(s"$outDir/wordcount")

      // exact (big-int + correctly-rounded division) scoring: this CLI is
      // the reference replacement, so its chisq artifacts reproduce the
      // reference's Python floats bit-for-bit (ChiSquare.scoreExact)
      val scored = ChiSquare.scoreExact(
        spark.read.parquet(s"$outDir/wordcount"), catTotals, total)
      val topk = ChiSquare.topKPerCategory(scored, k)
        .orderBy(col("category"), col("chi2").desc, col("word"))
      topk.write.mode("overwrite").parquet(s"$outDir/chisq")

      // parity text (tiny: ≤ categories × k rows — driver-side format)
      val rows = spark.read.parquet(s"$outDir/chisq").collect()
        .map(r => (r.getString(r.fieldIndex("category")),
          r.getString(r.fieldIndex("word")),
          r.getDouble(r.fieldIndex("chi2"))))
      val byCat = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (c, rs) =>
        (c, rs.sortBy(r => (-r._3, r._2)).map(r => r._2 -> r._3).toSeq)
      }
      val vocab = rows.map(_._2).distinct.sorted.toSeq
      val lines = RefFormats.formatChiSq(byCat) :+ RefFormats.formatVocabulary(vocab)
      Files.createDirectories(Paths.get(outDir))
      Files.writeString(Paths.get(s"$outDir/chisq.txt"),
        lines.mkString("", "\n", "\n"))
      println(s"[graft] $total reviews, ${catMap.size} categories, " +
        s"${rows.length} scored terms → $outDir")
      println(s"[graft] anomalies: ${counters.summary}")
      counters
    } finally pruned.unpersist(blocking = false)
  }
}
