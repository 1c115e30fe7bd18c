package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** χ² with the reference's EXACT arithmetic: the reference computes
  * `N·(A·D − B·C)² / ((A+B)(A+C)(B+D)(C+D))` in Python big-int and performs
  * ONE correctly-rounded float division (reference
  * `src/chiSquaredJob.py:93`). An all-double pipeline rounds at every
  * step and drifts 1 ulp on ~30% of values — enough to break byte-level
  * RawProtocol parity with the reference's committed part file.
  *
  * This expression reproduces Python `int.__truediv__`: exact BigInteger
  * numerator and denominator, then round-to-nearest-even of the exact
  * rational. It backs the reference-format sink (graft.pipeline.Main,
  * ChiSquareGoldenSpec byte-equality); the DECLARED `q_chisq_topk` query
  * keeps the shared-double formula because DuckDB cannot express
  * correctly-rounded big-int division (measured: HUGEINT/HUGEINT division
  * equals double(num)/double(den), 1 ulp off Python on 33% of samples).
  *
  * Codegen emits a static call to [[ChiSqExact.compute]] — the expression
  * stays inside whole-stage codegen; the BigInteger work only runs on the
  * post-aggregation (word, category) relation, never on corpus rows.
  *
  * Callers must pre-filter zero marginals (the reference `continue`s on
  * them, reference `src/chiSquaredJob.py:91-92`).
  */
case class ChiSqExact(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_chisq_py expects four bigint arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_chisq_py"

  override protected def nullSafeEval(a: Any, wt: Any, nd: Any, n: Any): Any =
    ChiSqExact.compute(a.asInstanceOf[Long], wt.asInstanceOf[Long],
      nd.asInstanceOf[Long], n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, wt, nd, n) =>
      s"${ev.value} = graft.functions.ChiSqExact.compute($a, $wt, $nd, $n);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, fo: Expression): ChiSqExact =
    copy(first = f, second = s, third = t, fourth = fo)
}

object ChiSqExact {

  /** Contingency cells from (df_count, word_total, n_docs, total), then the
    * exact χ². All cell sums fit in Long (≤ total); the squared numerator
    * does not (≈1e39 at the reference's full scale), hence BigInteger.
    */
  def compute(dfCount: Long, wordTotal: Long, nDocs: Long, total: Long): Double = {
    val a = dfCount
    val b = wordTotal - dfCount
    val c = nDocs - dfCount
    val d = total - a - b - c
    val adbc = BigInteger.valueOf(a).multiply(BigInteger.valueOf(d))
      .subtract(BigInteger.valueOf(b).multiply(BigInteger.valueOf(c)))
    val num = BigInteger.valueOf(total).multiply(adbc).multiply(adbc)
    val den = BigInteger.valueOf(a + b).multiply(BigInteger.valueOf(a + c))
      .multiply(BigInteger.valueOf(b + d)).multiply(BigInteger.valueOf(c + d))
    divToDouble(num, den)
  }

  /** Correctly-rounded (round-to-nearest-even) double quotient of two
    * exact non-negative integers — what CPython's int/int division does.
    * Scales the numerator so the integer quotient carries 54 bits
    * (53-bit mantissa + round bit), uses the remainder as the sticky bit,
    * and reassembles with an exact power-of-two scalb.
    */
  def divToDouble(num: BigInteger, den: BigInteger): Double = {
    require(den.signum > 0 && num.signum >= 0, s"divToDouble($num, $den)")
    if (num.signum == 0) return 0.0
    def scaledQuotient(s: Int): (BigInteger, BigInteger) = {
      val n2 = if (s > 0) num.shiftLeft(s) else num
      val d2 = if (s < 0) den.shiftLeft(-s) else den
      val qr = n2.divideAndRemainder(d2)
      (qr(0), qr(1))
    }
    // num/den ∈ [2^(nb-db-1), 2^(nb-db+1)) ⇒ with this scale the quotient
    // has 54 or 55 bits; one retry pins it at exactly 54
    var s = 54 - (num.bitLength - den.bitLength)
    var (q, r) = scaledQuotient(s)
    if (q.bitLength > 54) {
      s -= 1
      val qr = scaledQuotient(s); q = qr._1; r = qr._2
    }
    val roundBit = q.testBit(0)
    var m = q.shiftRight(1) // 53-bit mantissa
    if (roundBit && (r.signum != 0 || m.testBit(0)))
      m = m.add(BigInteger.ONE) // may carry to 2^53 — still an exact double
    // value = m · 2^(1-s); both factors exact, scalb is exact
    Math.scalb(m.doubleValue(), 1 - s)
  }
}
