package graft

import graft.relational.Relational
import org.apache.spark.sql.functions.col

/** Unit fixtures for relational operators whose semantics the oracle gate
  * exercises only statistically — here the funnel's strictly-after
  * ordering rules.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("abtest: salted assignment and scorecard match a driver replay") {
    import graft.model.Tables
    val sf = "/root/testdata/sf0.001"
    val rows = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.expr(
          "CAST(round(value * 100, 0) AS BIGINT)"))
      .as[(Long, String, Long)].collect()
    def variant(u: Long): String =
      if (graft.functions.Hashing.h48String(s"exp1-$u") % 2 == 0) "control"
      else "treatment"
    val byVariant = rows.groupBy(r => variant(r._1))
    val expected = byVariant.toSeq.map { case (v, rs) =>
      val users = rs.groupBy(_._1)
      val converted = users.count(_._2.exists(_._2 == "purchase"))
      (v, users.size.toLong, rs.length.toLong, converted.toLong,
        converted.toLong * 1000000L / users.size,
        rs.filter(_._2 == "purchase").map(_._3).sum)
    }.sortBy(_._1)
    val got = graft.relational.Relational.eventsAbTest(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the salt splits the population non-degenerately
    assert(got.size == 2 && got.forall(_._2 > 0))
  }

  test("srm guard: exact chi-square micro-units, hand-checked threshold") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.relational.Relational.eventsSrm(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got.size == 1)
    val (c, t, chi2, flag) = got.head
    assert(chi2 == (c - t) * (c - t) * 1000000L / (c + t))
    assert(flag == (chi2 > 3841459L))
    // a healthy 50/50 hash split on the fixture must NOT trip the guard
    assert(!flag)
  }

  test("funnel counts only strictly-after stage sequences") {
    val events = Seq(
      // user 1: clean view → click → purchase
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: only click BEFORE the first view — viewed, not clicked
      (2L, "click", 5L), (2L, "view", 10L),
      // user 3: purchase precedes the qualifying click — clicked, not converted
      (3L, "view", 10L), (3L, "purchase", 15L), (3L, "click", 20L),
      // user 4: never enters the funnel
      (4L, "error", 10L))
      .toDF("user_id", "event_type", "ts_us")
    val got = Relational.funnelStages(events)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((4L, 3L, 2L, 1L)),
      s"(n_users, n_viewed, n_clicked, n_converted) was $got")
  }

  test("events disorder: running-high-water lag and percentiles, hand-checked") {
    val dir = java.nio.file.Files.createTempDirectory("disorder").toString
    // arrival order = event_id; ts_us stream 10,20,15,30,5,30 →
    // disorder 0,0,5,0,25,0
    Seq((1L, 10L), (2L, 20L), (3L, 15L), (4L, 30L), (5L, 5L), (6L, 30L))
      .map { case (id, us) => (id, us * 1000L, "a") }
      .toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Relational.eventsDisorder(spark, dir).collect().head
    assert(r.getString(0) == "a")
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L)          // n, n_late
    assert(r.getLong(3) == 2L * 1000000L / 6L)                // late_ppm
    assert(r.getLong(4) == 25L)                               // max
    // sorted disorder [0,0,0,0,5,25]: p50=0, p95=20, p99≈24 (interpolated
    // as lower + (upper−lower)·frac — assert the same IEEE expression)
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 20.0)
    assert(math.abs(r.getDouble(7) - 24.0) < 1e-9)
  }

  test("rate limit: RANGE frame includes the exact window boundary") {
    val dir = java.nio.file.Files.createTempDirectory("rate").toString
    val W = Relational.RateLimitWindowUs
    // u1: events at 0, W (exactly in window of each other), W+1+W (out)
    Seq((1L, 0L), (2L, W), (3L, W + 1L + W))
      .map { case (id, us) => (id, us * 1000L, 1L) }
      .toDF("event_id", "ts", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.eventsRateLimit(spark, dir)
      .select("event_id", "n_in_window").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L)
    assert(got(2L) == 2L, "event exactly W earlier must be IN the frame")
    assert(got(3L) == 1L, "event W+1 earlier must be OUT of the frame")
  }

  test("cep negation: error strictly between view and purchase breaks clean") {
    val dir = java.nio.file.Files.createTempDirectory("cep").toString
    val H = graft.streaming.StreamingOps.AttribWindowUs
    // u1: view→purchase in window, no error → clean
    // u2: view→ERROR→purchase in window → converted, not clean
    // u3: view→purchase with error AT purchase ts → clean (strictly between)
    // u4: error BEFORE view, then purchase → clean (only following errors count)
    // u5: purchase beyond window → not converted
    Seq(
      (1L, 10L, "view", 100L), (1L, 11L, "purchase", 200L),
      (2L, 20L, "view", 100L), (2L, 21L, "error", 150L), (2L, 22L, "purchase", 200L),
      (3L, 30L, "view", 100L), (3L, 31L, "error", 200L), (3L, 32L, "purchase", 200L),
      (4L, 40L, "error", 50L), (4L, 41L, "view", 100L), (4L, 42L, "purchase", 200L),
      (5L, 50L, "view", 100L), (5L, 51L, "purchase", 100L + H + 1L))
      .map { case (u, id, t, us) => (id, us * 1000L, u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.eventsCep(spark, dir)
      .as[(Long, Long, Option[Long], Option[Long], Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 10L, Some(11L), Some(100L), true, true)))
    assert(got(2L) == ((2L, 20L, Some(22L), Some(100L), true, false)))
    assert(got(3L) == ((3L, 30L, Some(32L), Some(100L), true, true)))
    assert(got(4L) == ((4L, 41L, Some(42L), Some(100L), true, true)))
    assert(got(5L) == ((5L, 50L, None, None, false, false)))
  }

  test("scd2: intervals tile each key's history, exactly one open row") {
    val sf = "/root/testdata/sf0.001"
    val rows = Relational.scd2Intervals(spark, sf)
      .select(col("o_custkey"),
        org.apache.spark.sql.functions.expr("unix_micros(cast(valid_from as timestamp))"),
        org.apache.spark.sql.functions.expr("unix_micros(cast(valid_to as timestamp))"),
        col("is_current"))
      .as[(Long, Long, Option[Long], Boolean)].collect()
    rows.groupBy(_._1).foreach { case (ck, h) =>
      val hist = h.sortBy(r => (r._2, r._3.getOrElse(Long.MaxValue)))
      assert(hist.count(_._4) == 1, s"cust $ck open rows != 1")
      assert(hist.last._3.isEmpty && hist.last._4)
      hist.sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2), s"cust $ck gap")
        case _ =>
      }
    }
  }

  test("scd2: Window-API form row-identical to the declared one-text SQL") {
    val sf = "/root/testdata/sf0.001"
    val sql = Relational.scd2Intervals(spark, sf).collect().map(_.toString)
    val api = Relational.scd2IntervalsApi(spark, sf).collect().map(_.toString)
    assert(sql.toSeq == api.toSeq)
  }

  test("custdist: zero-order bucket survives the ON-clause filter") {
    import graft.model.Tables
    val sf = "/root/testdata/sf0.001"
    val custs = Tables.load(spark, sf, "customer")
      .select(col("c_custkey")).as[Long].collect().toSet
    val perCust = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderpriority"))
      .as[(Long, String)].collect()
      .filter(_._2 == "1-URGENT")
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expected = custs.toSeq
      .map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (cc, cd) => (-cd, -cc) }
    val got = Relational.custOrderDist(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(got == expected)
    // the distribution must carry a zero-order bucket (the row a WHERE
    // spelling of the filter would erase) and cover every customer
    assert(got.exists(_._1 == 0L))
    assert(got.map(_._2).sum == custs.size.toLong)
  }

  test("late lines: priority split equals a driver replay of the window") {
    import graft.model.Tables
    val sf = "/root/testdata/sf0.001"
    val lo = java.time.LocalDateTime.of(1996, 1, 1, 0, 0)
    val hi = java.time.LocalDateTime.of(1997, 1, 1, 0, 0)
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      .as[(Long, String, java.sql.Timestamp)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expected = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .as[(Long, String, java.sql.Timestamp)].collect()
      .flatMap { case (ok, rf, ship) =>
        orders.get(ok).collect {
          case (prio, od)
            if ship.after(od)
              && !ship.toLocalDateTime.isBefore(lo)
              && ship.toLocalDateTime.isBefore(hi) =>
            (rf, prio)
        }
      }
      .groupBy(_._1).view.mapValues { rs =>
        val high = rs.count(r =>
          r._2 == "1-URGENT" || r._2 == "2-HIGH").toLong
        (high, rs.length - high)
      }.toSeq.map { case (rf, (h, l)) => (rf, h, l) }.sortBy(_._1)
    val got = Relational.lateLines(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.forall(r => r._2 + r._3 > 0))
  }

  test("returned customers: revenue equals an exact decimal replay") {
    import graft.model.Tables
    val sf = "/root/testdata/sf0.001"
    val lo = java.time.LocalDateTime.of(1996, 1, 1, 0, 0)
    val hi = java.time.LocalDateTime.of(1996, 4, 1, 0, 0)
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .filter(r => !r._3.toLocalDateTime.isBefore(lo)
        && r._3.toLocalDateTime.isBefore(hi))
      .map(r => r._1 -> r._2).toMap
    val custs = Tables.load(spark, sf, "customer")
      .join(Tables.load(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val one = BigDecimal(1)
    val expected = Tables.load(spark, sf, "lineitem")
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .as[(Long, Double, Double)].collect()
      .flatMap { case (ok, px, disc) => orders.get(ok).map { ck =>
        (ck, BigDecimal(px).setScale(2) * (one -
          BigDecimal(disc).setScale(4)))
      } }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .map { case (ck, rev) =>
        val (name, nation) = custs(ck)
        (ck, name, nation,
          (rev * 100).setScale(0, BigDecimal.RoundingMode.FLOOR)
            .toDouble / 100.0)
      }
      .sortBy { case (ck, _, _, rev) => (-rev, ck) }.take(20)
    val got = Relational.returnedCustomers(spark, sf)
      .as[(Long, String, String, Double)].collect().toSeq
    assert(got == expected)
    assert(got.size == 20)
  }

  private def writeEvents(rows: Seq[(Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("relevents").toString
    rows.toDF("ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val NsPerDay = 86400000000000L

  test("retention matrix: cohort by first-seen week, one count per offset week") {
    val dir = writeEvents(Seq(
      // user 1: days 0 and 8 → cohort week 0, offsets 0 and 1
      (0L * NsPerDay, 1L, "view", 1.0), (8L * NsPerDay, 1L, "view", 1.0),
      // user 2: two same-week days collapse to one (cohort 0, offset 0)
      (1L * NsPerDay, 2L, "view", 1.0), (2L * NsPerDay, 2L, "view", 1.0),
      // user 3: first seen day 9 → cohort week 1, returns week offset 1
      (9L * NsPerDay, 3L, "view", 1.0), (16L * NsPerDay, 3L, "view", 1.0),
      // user 4: single day → cohort 0, offset 0 only
      (0L * NsPerDay, 4L, "view", 1.0)))
    val got = Relational.eventsRetention(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((0L, 0L, 3L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("outlier trim drops tails beyond the per-type percentile bounds") {
    // sorted values: -100, 10×18, 100 → p05 = 4.5, p95 = 14.5 (interpolated),
    // so exactly the eighteen 10s survive
    val vals = Seq(-100.0) ++ Seq.fill(18)(10.0) ++ Seq(100.0)
    val dir = writeEvents(vals.zipWithIndex.map { case (v, i) =>
      (i.toLong * NsPerDay, i.toLong, "a", v) })
    val got = Relational.outlierTrim(spark, dir)
      .as[(String, Long, Long, Double)].collect().toList
    assert(got == List(("a", 20L, 18L, 10.0)))
  }

  test("anomaly detector: single-bucket series emits no rows, not NaN z") {
    // every event of each type lands in ONE hour → gapfill grid has one
    // bucket per type → sample variance is 0/0 = NaN. NaN compares
    // greater than 3.0 in Spark, so an unguarded stddev would flag the
    // bucket with z = NaN; the momentCols guard must yield zero rows.
    val h = 3600000000000L // ns per hour
    val dir = writeEvents(Seq(
      (10L, 1L, "solo", 1.0), (20L, 2L, "solo", 1.0), (30L, 3L, "solo", 1.0),
      (5L * h + 10L, 4L, "mono", 1.0)))
    val got = Relational.eventsAnomaly(spark, dir).collect()
    assert(got.isEmpty, s"degenerate series must emit no anomalies, got ${got.toList}")
  }

  test("big orders: decimal-domain HAVING, ordered by totalprice desc") {
    import org.apache.spark.sql.functions.{col, sum}
    val sf = "/root/testdata/sf0.001"
    val rows = Relational.bigOrders(spark, sf)
      .as[(String, Long, Long, java.sql.Date, Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_._6 > 300.0))
    val prices = rows.map(_._5)
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    // cross-check the top order's quantity against a direct decimal sum
    val okey = rows.head._3
    val expect = graft.model.Tables.load(spark, sf, "lineitem")
      .where(col("l_orderkey") === okey)
      .agg(sum(col("l_quantity").cast("decimal(18,2)")))
      .as[java.math.BigDecimal].head()
    assert(expect.doubleValue == rows.head._6)
  }

  test("fuzzy join: deletion-neighborhood blocking equals brute-force edit distance 1") {
    val sf = "/root/testdata/sf0.001"
    val names = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name").as[(Long, String)].collect().sortBy(_._1)
    def lev1(a: String, b: String): Boolean = {
      if (a == b) return false
      val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
      if (t.length - s.length > 1) return false
      if (s.length == t.length) s.zip(t).count { case (x, y) => x != y } == 1
      else {
        var i = 0; var j = 0; var diff = 0
        while (i < s.length && j < t.length) {
          if (s(i) == t(j)) { i += 1; j += 1 }
          else { diff += 1; j += 1; if (diff > 1) return false }
        }
        true
      }
    }
    val brute = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && lev1(na, nb)
    } yield {
      val pos = na.zip(nb).indexWhere { case (x, y) => x != y } match {
        case -1 => math.min(na.length, nb.length) + 1
        case p  => p + 1
      }
      (pos.toLong, ia, ib)
    }).toSeq
    val expect = brute.groupBy(_._1).map { case (pos, ps) =>
      (pos, ps.size.toLong, ps.map(_._2).sum, ps.map(_._3).sum)
    }.toSet
    val got = Relational.fuzzyJoin(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("upsert: latest-event wins, ties break by event_id, absent keys insert") {
    val dir = java.nio.file.Files.createTempDirectory("upsfix").toString
    Seq((1L, "Customer#1", 10.0), (2L, "Customer#2", 20.0),
        (3L, "Customer#3", 30.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(
      // user 1: later ts wins regardless of event_id order
      (10L, 100L, 1L, "set", 11.0), (9L, 200L, 1L, "set", 99.0),
      // user 2: equal ts → larger event_id wins
      (11L, 100L, 2L, "set", 55.0), (12L, 100L, 2L, "set", 66.0),
      // user 4: not in the snapshot → INSERT branch
      (13L, 100L, 4L, "set", 44.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.upsert(spark, dir)
      .as[(Long, String, Double, Boolean, Boolean)].collect().toList
    assert(got == List(
      (1L, "Customer#1", 99.0, true, false),
      (2L, "Customer#2", 66.0, true, false),
      (3L, "Customer#3", 30.0, false, false),
      (4L, "Customer#new#4", 44.0, true, true)))
  }

  test("skew audit: exact integer shares and skew factor vs driver recomputation") {
    val sf = "/root/testdata/sf0.001"
    val rows = Relational.skewAudit(spark, sf)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val counts = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("user_id").count().as[(Long, Long)].collect()
    val total = counts.map(_._2).sum
    val maxN = counts.map(_._2).max
    val nKeys = counts.length.toLong
    val expectTop = counts.sortBy { case (u, c) => (-c, u) }.take(10).toSeq
    assert(rows.map(r => (r._2, r._3)).toSeq == expectTop)
    rows.foreach { case (rank, _, n, ppm, tot, nk, skew) =>
      assert(tot == total && nk == nKeys)
      assert(ppm == n * 1000000L / total)
      assert(skew == maxN * nKeys * 100L / total)
      assert(rank >= 1 && rank <= 10)
    }
  }

  test("TPC-H tranche: subquery constructs plan as hash joins, not loops") {
    val sf = "/root/testdata/sf0.001"
    def phys(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // Q4: correlated EXISTS becomes a shuffleable left semi hash join
    val q4 = phys(Relational.orderPriority(spark, sf))
    assert(q4.contains("LeftSemi"), q4.take(600))
    assert(!q4.contains("NestedLoop"))
    // Q22: date-bounded NOT EXISTS becomes a left anti hash join with the
    // date predicate pushed below it (into the orders side), and the
    // scalar-subquery threshold introduces no join node for the CTE
    val q22 = phys(Relational.idleRichCustomers(spark, sf))
    assert(q22.contains("LeftAnti"), q22.take(600))
    assert(!q22.contains("NestedLoop"))
    assert(q22.contains("Subquery") || q22.contains("subquery"))
    // Q2: the per-part min rides a window over the aggregated catalog
    // (the correlated scalar-min spelling was rejected at sf10 — §9.65);
    // still no loop join, and the catalog builds via hash aggregation
    val q2 = phys(Relational.minCostSupplier(spark, sf))
    assert(!q2.contains("NestedLoop"))
    assert(q2.contains("HashAggregate"))
  }

  test("TPC-H tranche: Q21 aggregation twin is row-identical to the correlated form") {
    val sf = "/root/testdata/sf0.01"
    val cor = Relational.waitingSuppliers(spark, sf)
      .as[(String, Long)].collect().toSeq
    val agg = Relational.waitingSuppliersAgg(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(cor == agg, s"correlated=${cor.take(5)} agg=${agg.take(5)}")
    assert(cor.nonEmpty)
    // and the twin never self-joins lineitem as semi/anti: one scan for
    // the catalog, one for the count-back — no LeftSemi/LeftAnti nodes
    val plan = Relational.waitingSuppliersAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LeftSemi") && !plan.contains("LeftAnti"), plan.take(600))
  }

  test("TPC-H tranche: Q2 min-equality keeps every tied min-cost supplier") {
    val sf = "/root/testdata/sf0.001"
    val rows = Relational.minCostSupplier(spark, sf)
      .select("p_partkey", "min_cost").as[(Long, Double)].collect()
    // within one part every emitted row carries the same (minimum) cost
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).distinct.length == 1)
    }
    // and it matches an independent per-part minimum over the catalog
    import graft.model.Tables
    val mins = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"),
        org.apache.spark.sql.functions.expr(
          "CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .groupBy("l_partkey")
      .agg(org.apache.spark.sql.functions.min("cents").as("mc"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (pk, cost) =>
      assert(math.round(cost * 100) == mins(pk))
    }
  }
}
