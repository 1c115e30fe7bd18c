package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGries.MisraGriesAggregator
import graft.textanalysis.TextAnalysis

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Run the sketch over `stream` split into `parts` partitions and
    * return (word → est). Partition count varies the merge tree — the
    * guarantee must hold under every one.
    */
  private def sketch(stream: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    val mg = new MisraGriesAggregator(k)
    val out = spark.createDataset(stream).repartition(parts)
      .select(mg.toColumn).head()
    out.words.zip(out.counts).toMap
  }

  private def checkBounds(stream: Seq[String], k: Int, parts: Int): Unit = {
    val est = sketch(stream, k, parts)
    val exact = stream.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val n = stream.size.toLong
    val m = est.values.sum
    val bound = (n - m) / (k + 1)
    assert(est.size <= k, s"summary holds ${est.size} > k=$k slots")
    exact.foreach { case (w, c) =>
      val e = est.getOrElse(w, 0L)
      assert(e <= c, s"overestimate: $w est=$e exact=$c (parts=$parts)")
      assert(c - e <= bound,
        s"bound broken: $w est=$e exact=$c bound=$bound (parts=$parts)")
    }
    // presence: anything heavier than the bound must be in the summary
    exact.filter(_._2 > bound).keys.foreach { w =>
      assert(est.contains(w), s"heavy word $w missing (parts=$parts)")
    }
  }

  test("MG bounds hold on a skewed stream across merge trees") {
    val rnd = new scala.util.Random(7)
    // Zipf-ish: word_i with weight ~ 1/(i+1)
    val words = (0 until 40).map(i => s"w$i")
    val stream = Seq.fill(20000) {
      val r = rnd.nextDouble()
      val i = math.min(39, (math.exp(r * math.log(41.0)) - 1).toInt)
      words(i)
    }
    for (parts <- Seq(1, 3, 32)) checkBounds(stream, k = 8, parts)
  }

  test("MG bounds hold on a uniform stream (worst case for retention)") {
    val rnd = new scala.util.Random(13)
    val stream = Seq.fill(5000)(s"u${rnd.nextInt(200)}")
    for (parts <- Seq(1, 8)) checkBounds(stream, k = 8, parts)
  }

  test("MG is exact when distinct words fit in k slots") {
    val stream = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(3)("c")
    val est = sketch(stream, k = 8, parts = 4)
    assert(est == Map("a" -> 100L, "b" -> 60L, "c" -> 3L))
  }

  test("q_heavy_hitters booleans are all true and rows are the exact top-N") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.heavyHitters(spark, sf)
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(rows.length == TextAnalysis.HeavyTopN)
    assert(rows.forall(r => r._3 && r._4), s"guarantee booleans false: ${rows.toList}")
    val counts = rows.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }
}
