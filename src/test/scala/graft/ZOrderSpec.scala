package graft

import org.apache.spark.sql.functions._
import graft.relational.Relational

/** Invariants of the declared z-order AUDIT (`q_zorder_audit`). The
  * layout machinery itself — `Sources.zorder2` (magic-mask interleave)
  * and `Sources.writeZOrdered` (normalized-grid layout writer) — is
  * proven separately in `SourcesSpec`, including the per-file two-axis
  * range measurement against a single-column sort; this spec pins the
  * oracle-checkable rollup geometry on the real tables.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

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
