package graft

import org.scalatest.funsuite.AnyFunSuite

/** The byte-regression diff logic (round-11 verdict ask #5) — pure, so
  * it gets a plain unit spec with no Spark session.
  */
class BenchGateSpec extends AnyFunSuite {

  test("byte regression gate: >10% AND >1MB growth flags, everything else passes") {
    val prior = Map(
      "q_a" -> ((100.0, 100.0)), // big query
      "q_b" -> ((0.2, 0.3)),     // tiny exchange
      "q_c" -> ((10.0, 10.0)),
      "q_d" -> ((50.0, 0.0)))
    val cur = Map(
      "q_a" -> ((115.0, 115.0)), // +15% and +30 MB → regression
      "q_b" -> ((2.0, 3.0)),     // +900% and +4.5 MB → regression
      "q_c" -> ((10.5, 10.5)),   // +5% → under the ratio floor
      "q_d" -> ((50.0, 1.05)),   // +2.1% (though +1.05 MB) → ratio saves it
      "q_new" -> ((999.0, 999.0))) // no committed baseline → not a regression
    val got = Bench.byteRegressions(prior, cur)
    assert(got == Seq(
      ("q_a", 200.0, 230.0),
      ("q_b", 0.5, 5.0)))
  }

  test("byte regression gate: absolute floor keeps AQE jitter on tiny exchanges quiet") {
    // +50% but only +0.9 MB — a partition-count wobble, not a plan change
    val got = Bench.byteRegressions(
      Map("q_t" -> ((1.0, 0.8))), Map("q_t" -> ((1.5, 1.2))))
    assert(got.isEmpty)
  }

  test("byte regression gate: empty prior (first round at a new sf) flags nothing") {
    assert(Bench.byteRegressions(Map.empty,
      Map("q_a" -> ((5.0, 5.0)))).isEmpty)
  }
}
