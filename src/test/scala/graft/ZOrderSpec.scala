package graft

import org.apache.spark.sql.functions._
import graft.relational.Relational

/** The layout claim behind `q_zorder_audit`, proven on real written
  * files: range-partitioning by the Morton value bounds BOTH dimensions
  * per file, while a single-column sort leaves the other dimension at
  * full table width — the difference between pruning and scanning for a
  * 2-D predicate.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // per written file: the fraction of the table's custkey range the file
  // spans, averaged over files (1.0 = every file spans everything)
  private def custSpread(dir: String): Double = {
    val f = spark.read.parquet(dir)
      .select(col("o_custkey"), input_file_name().as("f"))
    val spreads = f.groupBy("f")
      .agg((max("o_custkey") - min("o_custkey")).as("s"))
      .select("s").as[Long].collect()
    val full = f.agg(max("o_custkey") - min("o_custkey")).as[Long].head()
    spreads.map(_.toDouble / full).sum / spreads.length
  }

  test("z-range layout bounds custkey per file; date-sort does not") {
    val top = (1L << Relational.ZBits) - 1
    // bucket widths CALIBRATED TO THIS FIXTURE so both dimensions fill
    // the 8-bit grid (sf0.001 custkey tops out at 150 — the declared
    // audit's width-8 config is sized for sf0.01; a real table declares
    // widths per its own ranges, which is exactly what this does). An
    // uncalibrated grid degenerates toward a single-column sort — the
    // first version of this spec proved that by failing.
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("epoch_day",
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"))
      .withColumn("cb", least(lit(top), expr("o_custkey div 1")))
      .withColumn("db", least(lit(top), greatest(lit(0L),
        expr(s"(epoch_day - ${Relational.ZDayOffset}) div ${Relational.ZDayWidth}"))))
    // zval via the declared audit's own arithmetic (shared constants)
    val zval = (0 until Relational.ZBits).map(i =>
      s"((cb div ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + ((db div ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
      .mkString(" + ")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    o.withColumn("zval", expr(zval))
      .repartitionByRange(32, col("zval"))
      .write.mode("overwrite").parquet(s"$base/bydate_z")
    o.repartitionByRange(32, col("epoch_day"))
      .write.mode("overwrite").parquet(s"$base/bydate_only")
    val zSpread = custSpread(s"$base/bydate_z")
    val dSpread = custSpread(s"$base/bydate_only")
    // date-only files span essentially the whole custkey range; z files
    // stay inside bounded boxes — at least 2x tighter on average
    assert(dSpread > 0.8, s"date-sort spread should be ~full: $dSpread")
    assert(zSpread * 2 < dSpread, s"z=$zSpread vs date=$dSpread")
  }

  test("audit invariant: every z-range box is a bounded custkey slab") {
    val rows = Relational.zOrderAudit(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length > 4)
    val fullCust = rows.map(_._4).max - rows.map(_._3).min
    // within one z-range the custkey extent is at most the width the
    // curve geometry allows: ZRangeDiv/4 cb-buckets cover ≤ 16 buckets
    // at 8 custkeys each plus the in-bucket width
    rows.foreach { case (_, n, cLo, cHi, _, _) =>
      assert(n > 0)
      assert(cHi - cLo <= fullCust / 2,
        s"z-range spans most of custkey: $cLo..$cHi of $fullCust")
    }
  }
}
