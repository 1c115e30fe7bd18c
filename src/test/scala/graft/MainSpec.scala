package graft

import java.nio.file.{Files, Paths}
import graft.model.{Observe, RefFormats}
import graft.pipeline.Main

/** End-to-end drive of the CLI pipeline on a synthetic review file
  * covering the FIXTURES.md §A1 semantics: malformed line dropped,
  * missing category → Unknown, missing text → "", stripped char class.
  */
class MainSpec extends SparkSpec {

  test("Main.run produces counters, wordcount, chisq, and parity text") {
    val dir = Files.createTempDirectory("graft_main").toString
    val reviews = Seq(
      """{"category": "Book", "reviewText": "great plot, great pacing!"}""",
      """{"category": "Book", "reviewText": "plot was thin. weak plot."}""",
      """{"category": "Game", "reviewText": "great graphics & gameplay"}""",
      """{"category": "Game", "reviewText": "gameplay loop is addictive"}""",
      """{"reviewText": "no category here"}""",
      """{"category": "Book"}""",
      """not json at all {{{""",
    ).mkString("\n")
    Files.writeString(Paths.get(s"$dir/reviews.json"), reviews)
    Files.writeString(Paths.get(s"$dir/stopwords.txt"), "was\nis\n&\n")

    val anomalies =
      Main.run(spark, s"$dir/reviews.json", s"$dir/stopwords.txt", s"$dir/out", k = 2)

    // counters: 6 parsed reviews (malformed line dropped)
    val (total, cats) = RefFormats.readCounters(spark, s"$dir/out/counters.txt")
    assert(total == 6)
    assert(cats == Map("Book" -> 3L, "Game" -> 2L, "Unknown" -> 1L))

    // advisory anomaly surface: exactly the one malformed line, and the
    // stopword file loaded fine
    assert(anomalies.malformedLines.value == 1L)
    assert(anomalies.stopwordLoadFailures.value == 0L)

    val wc = spark.read.parquet(s"$dir/out/wordcount")
    import spark.implicits._
    val wcMap = wc.as[(String, String, Long)].collect()
      .map { case (w, c, n) => (w, c) -> n }.toMap
    // 'plot' appears in both Book docs but THREE times total — per-doc
    // dedup makes it a document frequency of 2; 'great' twice in one doc → 1
    assert(wcMap(("plot", "Book")) == 2)
    assert(wcMap(("great", "Book")) == 1)
    assert(wcMap(("great", "Game")) == 1)
    // stopwords removed, punctuation stripped
    assert(!wcMap.keySet.exists { case (w, _) => w == "was" || w == "&" })

    val topk = spark.read.parquet(s"$dir/out/chisq")
    assert(topk.groupBy("category").count().as[(String, Long)].collect()
      .forall(_._2 <= 2), "k=2 respected per category")

    val parity = Files.readAllLines(Paths.get(s"$dir/out/chisq.txt"))
    assert(parity.size == topk.select("category").distinct().count() + 1)
    assert(parity.get(parity.size - 1).startsWith("['"))
    assert(parity.get(0).matches("""\S+\t\{'.*"""))
  }

  test("missing stopword file: pipeline continues, anomaly counter fires") {
    val dir = Files.createTempDirectory("graft_main2").toString
    Files.writeString(Paths.get(s"$dir/reviews.json"),
      """{"category": "Book", "reviewText": "the plot is great"}""")

    val anomalies = Main.run(
      spark, s"$dir/reviews.json", s"$dir/no_such_stopwords.txt", s"$dir/out", k = 2)

    assert(anomalies.stopwordLoadFailures.value == 1L)
    assert(anomalies.malformedLines.value == 0L)
    // empty stopword set: 'the'/'is' survive (reference semantics)
    import spark.implicits._
    val words = spark.read.parquet(s"$dir/out/wordcount")
      .select("word").as[String].collect().toSet
    assert(words == Set("the", "plot", "is", "great"))
  }

  test("observed metrics report exactly the consumed rows") {
    import spark.implicits._
    val df = Seq((1L, "alpha"), (2L, null), (3L, "beta"))
      .toDF("doc_id", "text")
    val (framed, obs) = Observe.inputStats(df)
    framed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_rows") == 3L, s"n_rows: $m")
    assert(m("null_texts") == 1L, s"null_texts: $m")
    assert(m("text_chars") == 9L, s"text_chars: $m")
  }
}
