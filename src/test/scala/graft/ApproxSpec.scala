package graft

import graft.relational.Relational

/** Error bounds for the sketch scale-twins: the approximate aggregates
  * must track the exact queries within the sketches' configured accuracy
  * (HLL++ 1% target SD — allow 5% here; quantile summary at 1e-4
  * relative rank accuracy — allow 2% value slack on this data). The
  * declared `approxStats` output widens these to its 5% oracle booleans,
  * so this spec failing before the oracle flips is the designed margin.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("approx distinct + median stay within sketch error of exact") {
    val rows = Relational.approxStatsRaw(spark, sf)
      .select("event_type", "approx_users", "approx_median",
        "exact_users", "exact_median")
      .as[(String, Long, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((et, aUsers, aMedian, eUsers, eMedian) <- rows) {
      assert(math.abs(aUsers - eUsers) <= math.max(1L, (eUsers * 0.05).toLong),
        s"$et: approx_users=$aUsers exact=$eUsers")
      assert(math.abs(aMedian - eMedian) <= math.abs(eMedian) * 0.02 + 1e-9,
        s"$et: approx_median=$aMedian exact=$eMedian")
    }
  }

  test("declared approx_stats asserts its own error bounds as booleans") {
    val out = Relational.approxStats(spark, sf)
    assert(out.columns.toSeq === Seq("event_type", "n_events", "exact_users",
      "users_within_5pct", "median_rank_ok"))
    val flags = out.select("users_within_5pct", "median_rank_ok")
      .as[(Boolean, Boolean)].collect()
    assert(flags.nonEmpty)
    assert(flags.forall { case (u, m) => u && m })
  }

  /** The rank invariant must hold even where the old VALUE-distance
    * check legitimately fails: an even-count series whose two middle
    * values are far apart (exact percentile interpolates to ~50.5; the
    * sketch must return a real element near 1 or 100).
    */
  test("median rank flag survives a gappy bimodal distribution") {
    val dir = java.nio.file.Files.createTempDirectory("gappy").toString
    // ts is a raw nanosecond long, matching the driver parquet layout
    // (TIMESTAMP(NANOS) read under nanosAsLong — see Tables.withEventTime).
    val rows = (1 to 500).map(i => (i * 1000000000L, "gap", i.toLong, 1.0 + i * 1e-4)) ++
      (1 to 500).map(i => (i * 2000000000L, "gap", 500L + i, 100.0 + i * 1e-4))
    rows.toDF("ts", "event_type", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.approxStats(spark, dir)
      .select("users_within_5pct", "median_rank_ok")
      .as[(Boolean, Boolean)].collect()
    assert(got.length === 1 && got.head._2,
      s"rank invariant must hold on the bimodal fixture: ${got.toSeq}")
  }
}
