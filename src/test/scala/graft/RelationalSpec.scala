package graft

import graft.relational.Relational

/** Unit fixtures for relational operators whose semantics the oracle gate
  * exercises only statistically — here the funnel's strictly-after
  * ordering rules.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

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
}
