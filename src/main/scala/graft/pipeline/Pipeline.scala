package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.text.TextOps
import graft.wordcount.WordCount
import graft.chisq.ChiSquare

/** End-to-end composition of the reference's two-job pipeline (SURVEY.md §3)
  * as ONE lazy DataFrame DAG: reviews → document-frequency word count →
  * χ² → top-k per category → vocabulary. The reference materializes text
  * part files between its jobs; here the only materialization is the
  * driver-side counters collect (a few hundred bytes at any scale).
  */
object Pipeline {

  /** Full pipeline over a (text, category) relation.
    * @return (topK scored words per category, sorted union vocabulary)
    */
  def run(
      docs: DataFrame,
      textCol: String,
      categoryCol: String,
      stopwords: Set[String],
      k: Int = 75): (DataFrame, DataFrame) = {
    // cache the pruned 2-column projection: it feeds both the counters
    // aggregation and the wordcount — one scan instead of two at 100 TB
    // (the reference piggybacked counters on job 1 for the same reason)
    val spark = docs.sparkSession
    import spark.implicits._
    val pruned0 = docs.select(col(textCol).as("text"), col(categoryCol).as("category"))
    // spread ONLY when the scan under-parallelizes (a single-row-group test
    // file pins the whole tokenize+explode pipeline to one task). At real
    // scale the scan already splits by maxPartitionBytes and this
    // repartition would be a full-corpus shuffle bought for nothing — the
    // cost that would dominate the whole pipeline at 100 TB.
    val scanParts = pruned0.rdd.getNumPartitions
    val spread =
      if (scanParts >= spark.sparkContext.defaultParallelism) pruned0
      else pruned0.repartition(spark.sessionState.conf.numShufflePartitions,
        col("category"), col("text"))
    val pruned = spread.persist()
    try {
      // ONE action for all scalar state: collect the (tiny) per-category
      // counts, sum N driver-side, and re-ship them as the broadcast join
      // side — the reference's counters.txt round-trip without the file
      val catRows = WordCount.categoryTotals(pruned, col("category"))
        .as[(String, Long)].collect()
      val total = catRows.map(_._2).sum
      val catTotals = catRows.toSeq.toDF("category", "n_docs")
      val df = WordCount.documentFrequency(pruned, col("text"), col("category"), stopwords)
      val scored = ChiSquare.score(df, catTotals, total)
      val topk = ChiSquare.topKPerCategory(scored, k)
        .orderBy(col("category"), col("chi2").desc, col("word"))
      (topk, ChiSquare.vocabulary(topk))
    } finally pruned.unpersist(blocking = false)
  }
}

/** The reference pipeline's operators as driver-checkable queries over the
  * `documents` test table (text ≈ reviewText, lang ≈ category). Every query
  * has a DuckDB oracle twin built from the same tokenizer char class and
  * the same double-precision χ² expression shape, so hashes match bit-exact.
  */
object TextPipelineQueries {

  /** The reference's full 596-line stopword artifact, shipped as a
    * classpath resource (reference `src/data/stopwords.txt`; its
    * duplicates, e.g. `album` at `:17-18`, collapse here — the reference
    * loads into a Python set with the same effect). 591 distinct words
    * drive every declared query AND its oracle twin, so the driver's
    * correctness gate exercises the real artifact, not a toy list.
    */
  val stopwords: Seq[String] = {
    val in = getClass.getResourceAsStream("/stopwords.txt")
    require(in != null, "stopwords.txt missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toSeq.distinct
    finally in.close()
  }

  private def sqlList =
    stopwords.map(w => s"'${w.replace("'", "''")}'").mkString("(", ", ", ")")

  /** The tokenizer char class as a DuckDB/RE2 literal: same as
    * TextOps.strippedClass with the `'` doubled for SQL quoting.
    */
  private val duckClass = """[()\[\]{}.!?,;:+=\-_"~#@&*%€$§/\\0-9\t'']"""

  private val duckTokens =
    s"""SELECT doc_id, lang, unnest(list_distinct(string_split_regex(
        regexp_replace(lower(text), '$duckClass', ' ', 'g'), '\\s+'))) AS word
        FROM documents"""

  /** Per-language document frequency of every non-stopword token. */
  def wordcount(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents", "doc_id")
    WordCount.documentFrequency(docs, col("text"), col("lang"), stopwords.toSet)
      .withColumnRenamed("category", "lang")
      .orderBy("word", "lang")
  }

  def wordcountSql: String =
    s"""WITH tok AS ($duckTokens)
        SELECT word, lang, count(*) AS df_count FROM tok
        WHERE len(word) > 0 AND word NOT IN $sqlList
        GROUP BY word, lang ORDER BY word, lang"""

  /** Stopword removal as an explicit broadcast LEFT ANTI join (the
    * SQL-checkable twin of the InSet fast path — SURVEY.md §2 row 21).
    */
  def stopwordAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.loadSpread(spark, dir, "documents", "doc_id")
    val tokens = docs.select(col("doc_id"),
        explode(TextOps.reviewTokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
    val stop = stopwords.toDF("stopword")
    WordCount.antiJoinStopwords(tokens, stop)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy("word")
  }

  def stopwordAntiJoinSql: String =
    s"""WITH tok AS ($duckTokens)
        SELECT word, count(*) AS n FROM tok
        WHERE len(word) > 0 AND word NOT IN $sqlList
        GROUP BY word ORDER BY word"""

  /** χ² top-k words per language — the reference's flagship computation
    * re-expressed over the documents table.
    */
  def chisqTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val (topk, _) = Pipeline.run(docs, "text", "lang", stopwords.toSet, k)
    topk.withColumnRenamed("category", "lang")
  }

  def chisqTopKSql(k: Int = 10): String =
    s"""WITH tok AS ($duckTokens),
        df AS (
          SELECT word, lang AS category, count(*) AS df_count FROM tok
          WHERE len(word) > 0 AND word NOT IN $sqlList
          GROUP BY word, lang),
        ct AS (SELECT lang AS category, count(*) AS n_docs FROM documents GROUP BY lang),
        n AS (SELECT count(*) AS total FROM documents),
        wt AS (SELECT *, sum(df_count) OVER (PARTITION BY word) AS word_total FROM df),
        scored AS (
          SELECT word, category,
            CAST(total AS DOUBLE)
              * (CAST(df_count AS DOUBLE) * CAST(total - word_total - n_docs + df_count AS DOUBLE)
                 - CAST(word_total - df_count AS DOUBLE) * CAST(n_docs - df_count AS DOUBLE))
              * (CAST(df_count AS DOUBLE) * CAST(total - word_total - n_docs + df_count AS DOUBLE)
                 - CAST(word_total - df_count AS DOUBLE) * CAST(n_docs - df_count AS DOUBLE))
              / ((CAST(df_count AS DOUBLE) + CAST(word_total - df_count AS DOUBLE))
                 * (CAST(df_count AS DOUBLE) + CAST(n_docs - df_count AS DOUBLE))
                 * (CAST(word_total - df_count AS DOUBLE) + CAST(total - word_total - n_docs + df_count AS DOUBLE))
                 * (CAST(n_docs - df_count AS DOUBLE) + CAST(total - word_total - n_docs + df_count AS DOUBLE))) AS chi2
          FROM wt JOIN ct USING (category), n
          WHERE CAST(df_count AS DOUBLE) + CAST(word_total - df_count AS DOUBLE) <> 0
            AND CAST(df_count AS DOUBLE) + CAST(n_docs - df_count AS DOUBLE) <> 0
            AND CAST(word_total - df_count AS DOUBLE) + CAST(total - word_total - n_docs + df_count AS DOUBLE) <> 0
            AND CAST(n_docs - df_count AS DOUBLE) + CAST(total - word_total - n_docs + df_count AS DOUBLE) <> 0)
        SELECT word, category AS lang, chi2 FROM (
          SELECT word, category, chi2,
            row_number() OVER (PARTITION BY category ORDER BY chi2 DESC, word) AS rn
          FROM scored) t
        WHERE rn <= $k
        ORDER BY lang, chi2 DESC, word"""

  /** Sorted distinct union of the per-language top-k vocabularies — the
    * reference's final output line (SURVEY.md §2 rows 25-26).
    */
  def vocabulary(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val (topk, vocab) = Pipeline.run(docs, "text", "lang", stopwords.toSet, k)
    vocab
  }

  def vocabularySql(k: Int = 10): String = {
    val topk = chisqTopKSql(k)
    s"""SELECT DISTINCT word FROM ($topk) ORDER BY word"""
  }
}
