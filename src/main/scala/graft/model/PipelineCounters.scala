package graft.model

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Advisory anomaly counters — the engine's twin of the reference's
  * mrjob counter surface (reference `src/wordCountJob.py:48`
  * `stopwords_load_fail`, `src/utils/logger.py:3-53`): named
  * `LongAccumulator`s visible live in the Spark UI and queryable after a
  * run.
  *
  * ADVISORY only: Spark re-runs failed/speculative tasks and accumulator
  * updates from re-runs double-count, so these are observability signals,
  * never inputs to results — the canonical totals in
  * [[graft.pipeline.Main.run]] stay exact Dataset actions (the same split
  * the reference makes: its counters.txt totals come from the reducer's
  * exact counts, its anomaly counters from mrjob's advisory channel).
  */
final class PipelineCounters private (
    /** Input lines dropped by the PERMISSIVE JSON parse (the reference's
      * bare-`except` skip, reference `src/wordCountJob.py:71-72`). */
    val malformedLines: LongAccumulator,
    /** Stopword side-file missing/unreadable — pipeline continues with an
      * empty set (reference `src/wordCountJob.py:46-48`). */
    val stopwordLoadFailures: LongAccumulator) {

  def summary: String =
    s"malformed_lines=${malformedLines.value} " +
      s"stopword_load_failures=${stopwordLoadFailures.value}"
}

object PipelineCounters {
  def apply(spark: SparkSession): PipelineCounters = new PipelineCounters(
    spark.sparkContext.longAccumulator("graft.anomaly.malformed_lines"),
    spark.sparkContext.longAccumulator("graft.anomaly.stopword_load_failures"))
}
