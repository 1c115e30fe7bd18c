package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.RefFormats.pythonRepr

/** Python float `repr` parity — the rules CPython applies and Java 17's
  * Double.toString does not (fixed notation out to 1e16, e±XX exponents,
  * shortest round-trip digits).
  */
class RefFormatsSpec extends AnyFunSuite {

  test("pythonRepr: fixed notation where Java would use scientific") {
    assert(pythonRepr(1.0e7) === "10000000.0")
    assert(pythonRepr(1.0e15) === "1000000000000000.0")
    assert(pythonRepr(0.0001) === "0.0001")
    assert(pythonRepr(123456.78) === "123456.78")
  }

  test("pythonRepr: scientific notation at python's thresholds") {
    assert(pythonRepr(1.0e16) === "1e+16")
    assert(pythonRepr(1.5e16) === "1.5e+16")
    assert(pythonRepr(1.0e-5) === "1e-05")
    assert(pythonRepr(2.5e-123) === "2.5e-123")
  }

  test("pythonRepr: integral doubles keep the .0") {
    assert(pythonRepr(100.0) === "100.0")
    assert(pythonRepr(0.0) === "0.0")
    assert(pythonRepr(-3.0) === "-3.0")
  }

  test("pythonRepr: shortest round-trip digits") {
    assert(pythonRepr(0.1) === "0.1")
    assert(pythonRepr(1.0 / 3.0) === "0.3333333333333333")
    assert(pythonRepr(2158.3694068201294) === "2158.3694068201294")
    assert(pythonRepr(math.Pi) === "3.141592653589793")
  }

  test("pythonRepr: round-trips every formatted value") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 10000) {
      val d = math.exp(rng.nextGaussian() * 20) *
        (if (rng.nextBoolean()) 1 else -1)
      assert(pythonRepr(d).toDouble === d)
    }
  }
}
