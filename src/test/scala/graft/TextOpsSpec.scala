package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Unit + property tests of the tokenizer — SURVEY.md §7.4 risk #1: the
  * char class must map each stripped char to a SPACE (`don't` → `don t`),
  * keep `<>|^` intact, and strip `€§` + digits + tab.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tokensOf(s: String): Seq[String] =
    Seq(s).toDF("t")
      .select(TextOps.reviewTokens(col("t")).as("w"))
      .head().getSeq[String](0)

  test("stripped chars map to spaces, not deletion: don't -> don t") {
    assert(tokensOf("don't stop") === Seq("don", "t", "stop"))
  }

  test("<, >, |, ^ survive (reference quirk)") {
    assert(tokensOf("a > b | c ^ d < e") === Seq("a", ">", "b", "|", "c", "^", "d", "<", "e"))
  }

  test("digits, €, §, tab, punctuation are stripped") {
    assert(tokensOf("abc123def €50 §2\tx.y!z") === Seq("abc", "def", "x", "y", "z"))
  }

  test("case folding happens before tokenization") {
    assert(tokensOf("Hello WORLD") === Seq("hello", "world"))
  }

  test("per-review dedup: repeated words count once") {
    assert(tokensOf("spam spam spam ham") === Seq("spam", "ham"))
  }

  test("empty and whitespace-only input yields no tokens") {
    assert(tokensOf("") === Seq.empty)
    assert(tokensOf("   \t  123 ... ") === Seq.empty)
  }

  test("stopword artifact: 596 lines collapse to 591 distinct filterable words") {
    val sw = graft.pipeline.TextPipelineQueries.stopwords
    assert(sw.size === 591, "reference file has 5 duplicate words")
    assert(sw.distinct === sw)
    // the InSet filter runs on TOKENIZER OUTPUT, so every stopword must
    // survive tokenization unchanged (lowercase, no stripped chars) or it
    // could never match and would silently leak through
    for (w <- sw) assert(tokensOf(w) === Seq(w), s"stopword '$w' not tokenizer-stable")
  }

  test("full stopword list drives the wordcount filter") {
    val docs = Seq(
      (1L, "about the games", "en"),
      (2L, "the games about", "de")).toDF("doc_id", "text", "lang")
    val got = graft.wordcount.WordCount.documentFrequency(
        docs, col("text"), col("lang"),
        graft.pipeline.TextPipelineQueries.stopwords.toSet)
      .as[(String, String, Long)].collect().toSet
    // 'about' and 'the' are in the 596-word artifact; 'games' is not
    assert(got === Set(("games", "en", 1L), ("games", "de", 1L)))
  }

  test("property: tokens never contain stripped chars, never empty, always distinct") {
    val stripped = "()[]{}.!?,;:+=-_\"~#@&*%€$§/\\0123456789\t'".toSet
    val pool = "ab c(d)e1!?\t'€§<>|^/\\\n日本語ümn.,;:" // mixes kept + stripped + unicode
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(60)(
      Seq.fill(rnd.nextInt(30))(pool(rnd.nextInt(pool.length))).mkString)
    val rows = samples.toDF("t")
      .select(TextOps.reviewTokens(col("t")).as("w"))
      .collect().map(_.getSeq[String](0))
    for (ts <- rows) {
      assert(ts.forall(t => t.nonEmpty && !t.exists(stripped.contains)))
      assert(ts.distinct === ts)
    }
  }
}
