package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.{col, floor}
import graft.graph.Graph
import graft.relational.Expectations
import graft.textanalysis.{CorpusOps, TextAnalysis}

/** Round-8 additions: data-contract audit, triangle census, score AUC and
  * preference pairs — each verified against an independent driver-side
  * replay on a controlled fixture (never against the engine's own plan).
  */
class ContractsSpec extends SparkSpec {
  import spark.implicits._

  /** documents fixture with caller-controlled lang/source. */
  private def writeDocsFull(
      rows: Seq[(Long, String, String, String)]): String = {
    import org.apache.spark.sql.functions.length
    val dir = java.nio.file.Files.createTempDirectory("docsfull").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ----------------------------------------------------------- expectations

  test("expectations: seeded violations are counted, clean checks pass") {
    val dir = java.nio.file.Files.createTempDirectory("contract").toString
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // 6 lineitem rows: one duplicate PK, one quantity out of range, one
    // dangling orderkey, one NULL orderkey (dirty PK component — pins
    // the null-safe struct count-distinct: the NULL-key row must count
    // as its own distinct key, NOT be dropped and double-reported as a
    // duplicate); everything else clean.
    Seq(
      (Some(1L), 10L, 100L, 1, 5.0, 1000.0, 0.05, 0.02, "N", "O", ts),
      (Some(1L), 11L, 101L, 1, 5.0, 1000.0, 0.05, 0.02, "N", "O", ts), // dup
      (Some(1L), 12L, 102L, 2, 99.0, 1000.0, 0.05, 0.02, "A", "F", ts), // qty
      (Some(2L), 13L, 103L, 1, 5.0, 1000.0, 0.05, 0.02, "R", "F", ts),
      (Some(9L), 14L, 104L, 1, 5.0, 1000.0, 0.05, 0.02, "N", "O", ts), // dang
      (Option.empty[Long],
                 15L, 105L, 1, 5.0, 1000.0, 0.05, 0.02, "N", "O", ts)) // NULL
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // 3 orders, one with a dangling custkey.
    Seq((1L, 1L, "O", 100.0, ts, "1-URGENT"),
        (2L, 2L, "F", 100.0, ts, "2-HIGH"),
        (3L, 7L, "O", 100.0, ts, "2-HIGH")) // custkey 7 dangles
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val got = Expectations.expectations(spark, dir)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    val exp = Seq(
      // NULL l_orderkey can't resolve in orders → FK violation too
      ("fk_lineitem_orders", 6L, 2L, false),
      ("fk_orders_customer", 3L, 1L, false),
      ("li_discount_range", 6L, 0L, true),
      ("li_extendedprice_pos", 6L, 0L, true),
      ("li_linestatus_domain", 6L, 0L, true),
      ("li_orderkey_not_null", 6L, 1L, false),
      // exactly ONE duplicate: 6 rows, 5 distinct keys incl. (NULL, 1)
      ("li_pk_unique", 6L, 1L, false),
      ("li_quantity_range", 6L, 1L, false),
      ("li_returnflag_domain", 6L, 0L, true),
      ("li_shipdate_not_null", 6L, 0L, true))
    assert(got == exp)
  }

  // -------------------------------------------------------------- triangles

  test("triangles matches a brute-force census of the derived graph") {
    val n = 23
    val dir = writeDocs((0L until n.toLong).map(i => (i, s"doc $i")))
    // independent driver-side derivation + brute-force count
    val sym = (for {
      src <- 0L until n.toLong
      j <- 0 until Graph.Fanout
      dst = (src * 31 + j * 1009 + 7) % n
      if dst != src
      e <- Seq((src, dst), (dst, src))
    } yield e).toSet
    val canon = sym.filter { case (u, v) => u < v }
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = deg.keySet
    val tri = (for {
      u <- nodes; v <- nodes if u < v && canon((u, v))
      w <- nodes if v < w && canon((v, w)) && canon((u, w))
    } yield (u, v, w)).size.toLong
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val got = Graph.triangles(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((nodes.size.toLong, canon.size.toLong, tri, wedges,
      3L * tri * 1000000L / wedges)))
  }

  // -------------------------------------------------------------- score AUC

  test("scoreAuc: perfectly separated classes score exactly 1.0") {
    // en docs are natural prose (stopwords, diverse types); zz docs are
    // degenerate repetition — quality strictly separates the classes.
    val dir = writeDocsFull(
      (0L until 6L).map(i =>
        (i, "the quick brown fox jumps of the lazy dog", "en", "s0")) ++
      (6L until 12L).map(i => (i, "zz zz zz zz zz zz", "zz", "s0")))
    val Seq((np, nn, auc)) = TextAnalysis.scoreAuc(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert((np, nn) == (6L, 6L))
    assert(auc == 1000000L)
  }

  test("scoreAuc matches a driver-side pairwise replay with ties") {
    // overlapping classes incl. exact score ties across labels
    val texts = Seq(
      (0L, "the cat sat on the mat", "en"),
      (1L, "a dog ran to a tree", "en"),
      (2L, "der hund lief zum baum heute", "de"),
      (3L, "the cat sat on the mat", "de"), // tie with doc 0
      (4L, "la casa es muy bonita hoy", "es"),
      (5L, "of mice and men and more", "en"))
    val dir = writeDocsFull(texts.map { case (i, t, l) => (i, t, l, "s0") })
    val scored = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), floor(col("quality") * 1000000).cast("long"))
      .as[(Long, Long)].collect().toMap
    val pos = texts.filter(_._3 == "en").map(t => scored(t._1))
    val neg = texts.filter(_._3 != "en").map(t => scored(t._1))
    val u2 = (for { p <- pos; q <- neg } yield
      if (p > q) 2L else if (p == q) 1L else 0L).sum
    val expAuc = u2 * 1000000L / (2L * pos.size * neg.size)
    val Seq((np, nn, auc)) = TextAnalysis.scoreAuc(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert((np, nn, auc) == (pos.size.toLong, neg.size.toLong, expAuc))
  }

  // ------------------------------------------------------- preference pairs

  test("prefPairs picks per-stratum extremes with deterministic ties") {
    val texts = Seq(
      // stratum (s0, en): clear best/worst
      (0L, "the quick brown fox jumps of the lazy dog", "en", "s0"),
      (1L, "zz zz zz zz zz zz", "en", "s0"),
      (2L, "a plain middling sentence here", "en", "s0"),
      // stratum (s0, de): all same text — zero margin, must drop
      (3L, "gleicher text", "de", "s0"),
      (4L, "gleicher text", "de", "s0"),
      // stratum (s1, en): single doc, must drop
      (5L, "only one document", "en", "s1"))
    val dir = writeDocsFull(texts)
    val scored = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), floor(col("quality") * 1000000).cast("long"))
      .as[(Long, Long)].collect().toMap
    val s0en = Seq(0L, 1L, 2L).map(i => (scored(i), i))
    val best = s0en.max
    val worst = s0en.min
    val got = CorpusOps.prefPairs(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(("s0", "en", 3L, best._2, worst._2, best._1, worst._1,
      best._1 - worst._1)))
  }

  // ------------------------------------------------------ global percentile

  test("qualityGlobal: block-decomposed rank equals the one-window rank") {
    val texts = Seq(
      (0L, "the quick brown fox jumps of the lazy dog"),
      (1L, "zz zz zz zz zz zz"),
      (2L, "a plain middling sentence here"),
      (3L, "zz zz zz zz zz zz"), // exact tie with doc 1 → doc_id order
      (4L, "of mice and men and more and more"),
      (5L, "the the the the the"))
    val dir = writeDocs(texts)
    val scored = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality"))
      .as[(Long, Double)].collect().toMap
    val n = texts.size
    val expected = texts.map(_._1).sortBy(i => (scored(i), i)).zipWithIndex
      .map { case (i, rk) => i -> rk.toLong * 1000000L / (n - 1) }.toMap
    val got = TextAnalysis.qualityGlobal(spark, dir)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.map(r => r._1 -> r._3).toMap == expected)
    assert(got.map(_._1) == texts.map(_._1)) // doc_id order
  }

  // ----------------------------------------------------- temperature mixture

  test("langTemperature: α-weights upsample the tail, ppm sums hold") {
    // one dominant language, two tails
    val texts =
      (0L until 16L).map(i => (i, "the big corpus language text", "en", "s")) ++
      Seq((16L, "kleine sprache hier", "de", "s"),
          (17L, "idioma pequeno aqui", "es", "s"))
    val dir = writeDocsFull(texts.map { case (i, t, l, s) => (i, t, l, s) })
    val got = CorpusOps.langTemperature(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // shares are exact integers of the token masses
    val masses = Map("en" -> 16L * 5, "de" -> 3L, "es" -> 3L)
    val tot = masses.values.sum
    for ((l, m) <- masses) {
      assert(got(l)._2 == m)
      assert(got(l)._3 == m * 1000000L / tot)
      // temperature compresses: weight share sits between uniform and
      // natural share for the head, above natural for the tail
      if (l == "en") assert(got(l)._4 < got(l)._3)
      else assert(got(l)._4 > got(l)._3)
    }
    // floor-truncated ppm distribution still sums to ~1e6
    val s = got.values.map(_._4).sum
    assert(s <= 1000000L && s > 999990L)
  }

  // ----------------------------------------------------------- media dedup

  test("mediaDedup: duplicate payloads ledger with canonical keepers") {
    val dir = writeDocs(Seq(
      (0L, "same payload bytes"), (1L, "same payload bytes"),
      (2L, "same payload bytes"), // triple → saves 2× its bytes
      (3L, "unique one"), (4L, "another unique"),
      (5L, "pair bytes"), (6L, "pair bytes")))
    val got = graft.multimodal.Multimodal.mediaDedup(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
      .map { case (_, n, canon, each, saved) => (n, canon, each, saved) }
      .sortBy(_._2)
    val b3 = "same payload bytes".getBytes("UTF-8").length.toLong
    val b2 = "pair bytes".getBytes("UTF-8").length.toLong
    assert(got == Seq((3L, 0L, b3, 2 * b3), (2L, 5L, b2, b2)))
  }

  // ------------------------------------------------------- events forecast

  test("eventsForecast: seasonal-naive replay on a controlled stream") {
    import org.apache.spark.sql.functions.{lit => flit}
    val dir = java.nio.file.Files.createTempDirectory("fc").toString
    val hourNs = 3600L * 1000000000L
    val dayNs = 24 * hourNs
    // 3 days of 'click' at hour 2: 4, 6, then 3 on the last day;
    // 1 event of 'view' at hour 5 on the last day only
    val rows =
      (0 until 4).map(i => (100L + i, 0L * dayNs + 2 * hourNs + i, "click")) ++
      (0 until 6).map(i => (200L + i, 1L * dayNs + 2 * hourNs + i, "click")) ++
      (0 until 3).map(i => (300L + i, 2L * dayNs + 2 * hourNs + i, "click")) ++
      Seq((400L, 2L * dayNs + 5 * hourNs, "view"))
    // `ts` as a raw nanos LONG — Tables.withEventTime's long branch, the
    // same physical shape as the driver's TIMESTAMP(NANOS) parquet
    rows.toDF("event_id", "ts", "event_type")
      .withColumn("user_id", col("event_id") % 7)
      .withColumn("value", flit(1.0))
      .withColumn("props", flit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.relational.Relational.eventsForecast(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .filter(r => r._4 > 0 || r._3 > 0)
    // click@2: forecast (4+6) div 2 = 5, actual 3, err 2
    // view@5: forecast 0 (never seen in train), actual 1, err 1
    assert(got.toSet == Set(("click", 2L, 5L, 3L, 2L),
      ("view", 5L, 0L, 1L, 1L)))
    // grid is dense: |types|·24 rows
    assert(graft.relational.Relational.eventsForecast(spark, dir).count()
      == 48L)

    // DAU/MAU over the same fixture: users are event_id % 7, so day 0
    // has 4 events → 4 distinct users, day 1 has 6 → 6, day 2 has 4
    // events (3 click + 1 view) → distinct of {300..302 % 7, 400 % 7}
    val users = rows.map { case (id, ts, _) => (ts / dayNs, id % 7) }
    val mau = users.map(_._2).distinct.size.toLong
    val expDau = users.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    val dau = graft.relational.Relational.eventsDau(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(dau == expDau.toSeq.sortBy(_._1).map { case (d, n) =>
      (d, n, n * 1000000L / mau) })
  }

  test("eventsForecastCal vs eventsForecast on a gappy stream") {
    import org.apache.spark.sql.functions.{lit => flit}
    val dir = java.nio.file.Files.createTempDirectory("fcgap").toString
    val hourNs = 3600L * 1000000000L
    val dayNs = 24 * hourNs
    // days 0 and 1 each carry 4 'click' at hour 2; days 2-3 are FULLY
    // event-less (the gap the two spines disagree on); day 4 (last) has
    // 2 clicks at hour 2
    val rows =
      (0 until 4).map(i => (100L + i, 0L * dayNs + 2 * hourNs + i, "click")) ++
      (0 until 4).map(i => (200L + i, 1L * dayNs + 2 * hourNs + i, "click")) ++
      (0 until 2).map(i => (300L + i, 4L * dayNs + 2 * hourNs + i, "click"))
    rows.toDF("event_id", "ts", "event_type")
      .withColumn("user_id", col("event_id") % 7)
      .withColumn("value", flit(1.0))
      .withColumn("props", flit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def hot(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long, Long, Long)].collect()
        .filter(r => r._3 > 0 || r._4 > 0).toSet
    // observed-days spine: d_train = 3 observed days − 1 = 2 → the gap
    // days vanish and the seasonal mean stays 8 div 2 = 4
    assert(hot(graft.relational.Relational.eventsForecast(spark, dir))
      == Set(("click", 2L, 4L, 2L, 2L)))
    // calendar spine: d_train = max(day) − min(day) = 4 → the two quiet
    // days count as true zeros and the mean halves to 8 div 4 = 2
    assert(hot(graft.relational.Relational.eventsForecastCal(spark, dir))
      == Set(("click", 2L, 2L, 2L, 0L)))
    // both grids stay dense: |types|·24
    assert(graft.relational.Relational.eventsForecastCal(spark, dir).count()
      == 24L)
  }

  // ------------------------------------------------------ extra invariants

  test("expectations: a fully-clean fixture passes every constraint") {
    val dir = java.nio.file.Files.createTempDirectory("clean").toString
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((1L, 10L, 100L, 1, 5.0, 1000.0, 0.05, 0.02, "N", "O", ts),
        (2L, 11L, 101L, 1, 7.0, 1200.0, 0.00, 0.00, "A", "F", ts))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L, "O", 100.0, ts, "1-URGENT"),
        (2L, 2L, "F", 100.0, ts, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = Expectations.expectations(spark, dir)
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.length == 10 && got.forall(_._4),
      got.filterNot(_._4).mkString(", "))
    assert(got.forall(_._3 == 0L))
  }

  test("triangles: brute-force census agrees across several graph sizes") {
    // the degree-oriented join must count exactly once per triangle for
    // any modular-graph shape; sweep sizes incl. ones with tie-heavy
    // degree distributions
    for (n <- Seq(5, 11, 17, 31)) {
      val dir = writeDocs((0L until n.toLong).map(i => (i, s"d $i")))
      val sym = (for {
        src <- 0L until n.toLong
        j <- 0 until Graph.Fanout
        dst = (src * 31 + j * 1009 + 7) % n
        if dst != src
        e <- Seq((src, dst), (dst, src))
      } yield e).toSet
      val canon = sym.filter { case (u, v) => u < v }
      val nodes = sym.map(_._1)
      val tri = (for {
        u <- nodes; v <- nodes if u < v && canon((u, v))
        w <- nodes if v < w && canon((v, w)) && canon((u, w))
      } yield (u, v, w)).size.toLong
      val got = Graph.triangles(spark, dir)
        .as[(Long, Long, Long, Long, Long)].collect().head
      assert(got._3 == tri, s"n=$n: got ${got._3}, brute $tri")
    }
  }

  test("scoreAuc: flipping the positive class complements the AUC") {
    // AUC(pos) + AUC(neg-as-pos) = 1 exactly in the midrank convention;
    // with ppm floor-quantization the two sum to 1e6 ± 1
    val dir = writeDocsFull(Seq(
      (0L, "the cat sat on the mat", "en", "s"),
      (1L, "a dog ran to a tree", "en", "s"),
      (2L, "der hund lief zum baum heute", "de", "s"),
      (3L, "la casa es muy bonita hoy", "es", "s"),
      (4L, "of mice and men and more", "en", "s"),
      (5L, "zz zz zz zz", "de", "s")))
    val Seq((np, nn, auc)) = TextAnalysis.scoreAuc(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    // complement via the driver-side pairwise formula on engine scores
    val scored = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), floor(col("quality") * 1000000).cast("long"))
      .as[(Long, Long)].collect().toMap
    val langs = Map(0L -> "en", 1L -> "en", 2L -> "de", 3L -> "es",
      4L -> "en", 5L -> "de")
    val pos = langs.filter(_._2 != "en").keys.map(scored).toSeq
    val neg = langs.filter(_._2 == "en").keys.map(scored).toSeq
    val u2 = (for { p <- pos; q <- neg } yield
      if (p > q) 2L else if (p == q) 1L else 0L).sum
    val aucFlip = u2 * 1000000L / (2L * pos.size * neg.size)
    assert((np, nn) == (3L, 3L))
    assert(math.abs(auc + aucFlip - 1000000L) <= 1L)
  }
}
