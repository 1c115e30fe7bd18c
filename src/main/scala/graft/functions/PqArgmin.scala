package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd PQ subspace encoder: for an `array<double>` vector v and ONE
  * subspace's codebook (`cents` = the K codewords row-major-flattened,
  * `cc` = their squared norms ‖c_k‖²), scans v[off .. off+dim) once and
  * returns `array<double>` `[p, k, xx]` where
  *
  *   - p  = min_k (−2·⟨c_k, sv⟩ + ‖c_k‖²)  — the PQ partial distance of
  *          the winning codeword (‖sv‖² is constant per subspace, the
  *          standard PQ trick),
  *   - k  = the winning code (ties to the LOWEST k — `ORDER BY p, k`),
  *   - xx = ‖sv‖² (the subspace self-dot the reconstruction error
  *          re-adds: err_m = xx_m + p_m).
  *
  * WHY AN EXPRESSION (the §9.41 lesson, fifth instance): the declarative
  * form — `array_min` over one `struct(−2·graft_dot(sv, lit(c)) + ‖c‖²,
  * k)` entry per codeword — allocates a K-element array of struct rows
  * PER ROW PER SUBSPACE on top of the `slice()`d subvector copies;
  * measured at sf10 that allocation churn made the "pure projection"
  * encode run ~15 µs/row (≈30 s for 2M vectors) when the arithmetic is
  * ~1k flops. This expression reads the subvector in place (`off` skips
  * the slice) and allocates one 3-double array per row.
  *
  * Numeric contract, matched to the declarative form and the DuckDB
  * oracle bit-for-bit: every dot accumulates left-to-right from +0.0
  * (the [[DotProduct]]/list_reduce fold), each candidate's partial is
  * computed as `−2.0 · acc + cc_k` in exactly that operation order, and
  * a strictly-less comparison keeps the first (lowest-k) minimum ↔
  * `ORDER BY partial, k`. A null element or a vector shorter than
  * off + dim yields null (the declarative form's `graft_dot` null
  * contract) — unreachable on the generated embeddings tables.
  */
case class PqArgmin(child: Expression,
    cents: IndexedSeq[Double], cc: IndexedSeq[Double], dim: Int, off: Int)
    extends UnaryExpression {

  require(dim > 0 && off >= 0 && cc.nonEmpty &&
    cents.length == cc.length * dim,
    s"bad codebook shape: cents=${cents.length} cc=${cc.length} " +
      s"dim=$dim off=$off")

  private def nCodes: Int = cc.length

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_argmin expects array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_argmin"

  @transient private lazy val centData: Array[Double] = cents.toArray
  @transient private lazy val ccData: Array[Double] = cc.toArray

  private def encode(v: ArrayData): Any = {
    if (v.numElements() < off + dim) return null
    var xx = 0.0
    var k = 0
    while (k < dim) {
      if (v.isNullAt(off + k)) return null
      val x = v.getDouble(off + k)
      xx += x * x
      k += 1
    }
    var best = 0
    var bestP = Double.PositiveInfinity
    var i = 0
    while (i < nCodes) {
      var acc = 0.0
      var j = 0
      while (j < dim) {
        acc += centData(i * dim + j) * v.getDouble(off + j)
        j += 1
      }
      val p = -2.0 * acc + ccData(i)
      if (p < bestP) { bestP = p; best = i }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(bestP, best.toDouble, xx))
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", centData, "double[]")
    val ccRef = ctx.addReferenceObj("pqCc", ccData, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val ok = ctx.freshName("ok"); val xx = ctx.freshName("xx")
      val k = ctx.freshName("k"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val p = ctx.freshName("p"); val x = ctx.freshName("x")
      val best = ctx.freshName("best"); val bestP = ctx.freshName("bestP")
      s"""
         |boolean $ok = $v.numElements() >= ${off + dim};
         |double $xx = 0.0;
         |if ($ok) {
         |  for (int $k = 0; $k < $dim; $k++) {
         |    if ($v.isNullAt($off + $k)) { $ok = false; break; }
         |    double $x = $v.getDouble($off + $k);
         |    $xx += $x * $x;
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0;
         |  double $bestP = Double.POSITIVE_INFINITY;
         |  for (int $i = 0; $i < ${nCodes}; $i++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += $centsRef[$i * $dim + $j] * $v.getDouble($off + $j);
         |    }
         |    double $p = -2.0 * $acc + $ccRef[$i];
         |    if ($p < $bestP) { $bestP = $p; $best = $i; }
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |      .fromPrimitiveArray(new double[] {$bestP, (double) $best, $xx});
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqArgmin =
    copy(child = newChild)
}
