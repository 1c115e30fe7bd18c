package graft

import org.apache.spark.sql.functions._
import graft.model.RefFormats
import graft.chisq.ChiSquare

/** End-to-end golden test of the χ² stage against the reference's committed
  * devset fixtures: the 32 wordcount part files feed our operator and the
  * result is compared to `chisq/part-00000` (reference
  * `src/output/amazon_reviews_chiotp/`). The devset counters are not
  * committed upstream; `src/test/resources/devset_counters.txt` holds the
  * exact integers recovered by inverting the χ² formula on the golden
  * scores (all 1,650 reproduce with zero error — see git history).
  */
class ChiSquareGoldenSpec extends SparkSpec {

  private val refOut = "/root/reference/src/output/amazon_reviews_chiotp"
  private val countersPath =
    getClass.getResource("/devset_counters.txt").getPath

  private lazy val golden: Map[String, Seq[(String, Double)]] = {
    val lines = scala.io.Source.fromFile(s"$refOut/chisq/part-00000", "UTF-8")
      .getLines().toSeq
    val entry = "'([^']+)': ([-0-9.eE+]+)".r
    lines.dropRight(1).map { line =>
      val Array(cat, dict) = line.split("\t", 2)
      cat -> entry.findAllMatchIn(dict).map(m => m.group(1) -> m.group(2).toDouble).toSeq
    }.toMap
  }

  private lazy val goldenVocab: Seq[String] = {
    val last = scala.io.Source.fromFile(s"$refOut/chisq/part-00000", "UTF-8")
      .getLines().toSeq.last
    "'([^']+)'".r.findAllMatchIn(last).map(_.group(1)).toSeq
  }

  private lazy val ourTopK: Map[String, Seq[(String, Double)]] = {
    val wc = RefFormats.readWordCounts(spark, s"$refOut/wordcount/part-*")
    val (total, counters) = RefFormats.readCounters(spark, countersPath)
    val catTotals = spark.createDataFrame(counters.toSeq).toDF("category", "n_docs")
    val scored = ChiSquare.scoreExact(wc, catTotals, total)
    ChiSquare.topKPerCategory(scored, 75)
      .collect()
      .map(r => (r.getString(1), r.getString(0), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (c, rs) => c -> rs.map(t => (t._2, t._3)).toSeq }
  }

  test("ChiSqExact matches CPython int-division bits on adversarial cells") {
    // fixtures generated with CPython: cases where double(num)/double(den)
    // differs from the correctly-rounded num/den (1-ulp traps); expected
    // bits are the exact Python results
    val cases = Seq(
      (123L, 24684L, 114752L, 4315799L, java.lang.Double.longBitsToDouble(4646584838587836589L)),
      (1139L, 41897L, 114025L, 45717651L, java.lang.Double.longBitsToDouble(4666875217051517209L)),
      (1471L, 91636L, 140156L, 13031052L, java.lang.Double.longBitsToDouble(4642766933800744766L)),
      (2989L, 123424L, 284126L, 5881819L, java.lang.Double.longBitsToDouble(4654713097196612910L)),
      (1551L, 22207L, 290979L, 16803883L, java.lang.Double.longBitsToDouble(4660146857921098775L)),
      (788L, 185487L, 37254L, 77540893L, java.lang.Double.longBitsToDouble(4662765720152674110L)))
    for ((a, wt, nd, n, want) <- cases) {
      val got = graft.functions.ChiSqExact.compute(a, wt, nd, n)
      assert(java.lang.Double.doubleToLongBits(got) ===
        java.lang.Double.doubleToLongBits(want), s"cells ($a,$wt,$nd,$n)")
    }
  }

  test("devset golden: 22 categories, 75 words each") {
    assert(ourTopK.keySet === golden.keySet)
    assert(golden.keySet.size === 22)
    for (c <- golden.keySet) assert(ourTopK(c).size === golden(c).size, s"category $c")
  }

  test("devset golden: top-75 membership matches per category") {
    for (c <- golden.keySet) {
      val ours = ourTopK(c).map(_._1).toSet
      val gold = golden(c).map(_._1).toSet
      assert(ours === gold, s"category $c membership")
    }
  }

  test("devset golden: every chi2 score matches within 1e-9 relative") {
    for (c <- golden.keySet) {
      val ours = ourTopK(c).toMap
      for ((w, g) <- golden(c)) {
        val o = ours(w)
        assert(math.abs(o - g) <= 1e-9 * math.abs(g), s"$c/$w: ours=$o golden=$g")
      }
    }
  }

  test("property: divToDouble is correctly rounded (error-minimal vs neighbors)") {
    // q is THE correctly-rounded quotient iff no adjacent double is
    // closer to the exact rational: |q·den − num| ≤ |q'·den − num| for
    // both neighbors q' — checked in exact BigDecimal arithmetic
    import java.math.{BigDecimal => JBD, BigInteger => JBI}
    val rng = new scala.util.Random(3)
    def err(q: Double, num: JBI, den: JBI): JBD =
      new JBD(q).multiply(new JBD(den)).subtract(new JBD(num)).abs()
    for (_ <- 1 to 5000) {
      val num = new JBI(rng.nextInt(120) + 8, rng.self)
      val den = new JBI(rng.nextInt(90) + 8, rng.self).add(JBI.ONE)
      val q = graft.functions.ChiSqExact.divToDouble(num, den)
      val e = err(q, num, den)
      assert(e.compareTo(err(Math.nextUp(q), num, den)) <= 0,
        s"nextUp closer for $num/$den")
      assert(e.compareTo(err(Math.nextDown(q), num, den)) <= 0,
        s"nextDown closer for $num/$den")
    }
  }

  test("devset golden: RawProtocol output is byte-equal, all 23 lines") {
    val fixture = scala.io.Source
      .fromFile(s"$refOut/chisq/part-00000", "UTF-8").getLines().toSeq
    val byCat = ourTopK.toSeq.sortBy(_._1).map { case (c, ws) =>
      c -> ws.sortBy { case (w, s) => (-s, w) }
    }
    val vocab = ourTopK.values.flatMap(_.map(_._1)).toSeq.distinct.sorted
    val ours = RefFormats.formatChiSq(byCat) :+ RefFormats.formatVocabulary(vocab)
    assert(ours.size === fixture.size)
    for ((o, f) <- ours.zip(fixture)) assert(o === f)
  }

  test("devset golden: union vocabulary matches exactly, sorted") {
    val ourVocab = ourTopK.values.flatMap(_.map(_._1)).toSeq.distinct.sorted
    assert(goldenVocab === goldenVocab.sorted, "golden line is sorted")
    assert(ourVocab === goldenVocab)
  }
}
