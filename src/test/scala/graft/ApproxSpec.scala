package graft

import graft.relational.Relational

/** Error bounds for the sketch scale-twins: the approximate query must
  * track the exact queries within the sketches' configured accuracy
  * (HLL++ 1% target SD — allow 5% here; quantile summary at 1e-4
  * relative rank accuracy — allow 2% value slack on this data).
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("approx distinct + median stay within sketch error of exact") {
    val approx = Relational.approxStats(spark, sf)
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exactUsers = Relational.distinctUsers(spark, sf)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    val exactMedian = graft.model.Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.expr("percentile(value, 0.5)").as("m"))
      .as[(String, Double)].collect().toMap
    assert(approx.keySet === exactUsers.keySet)
    for ((et, (aUsers, aMedian)) <- approx) {
      val eUsers = exactUsers(et)
      assert(math.abs(aUsers - eUsers) <= math.max(1L, (eUsers * 0.05).toLong),
        s"$et: approx_users=$aUsers exact=$eUsers")
      val eMedian = exactMedian(et)
      assert(math.abs(aMedian - eMedian) <= math.abs(eMedian) * 0.02 + 1e-9,
        s"$et: approx_median=$aMedian exact=$eMedian")
    }
  }
}
