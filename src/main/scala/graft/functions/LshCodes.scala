package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd random-hyperplane LSH bucket codes: for an `array<double>`
  * vector v, returns `array<int>` of length `nTables` where element t =
  * Σ_j [dot(plane_{t,j}, v) ≥ 0]·2^j over `nPlanes` planes.
  *
  * WHY AN EXPRESSION (round-11 stage-probe finding): the declarative
  * form — one `when(graft_dot(lit(plane), v) >= 0, 1<<j)` term per
  * (table, plane) — bakes tables×planes 64-element array literals into
  * ONE generated projection method. At the floor width (4×4 = 16 dots)
  * that method JIT-compiles; at the corpus-adaptive widths the contract
  * picks at scale (7×11 = 77 dots at sf1, 10×22 = 220 at sf10) it blows
  * past HotSpot's compilable-method limits and the bucket computation
  * runs INTERPRETED — measured 200 s of executor CPU per pass over a
  * 5 MB input at sf1, ×3 passes (both self-join sides + the broadcast
  * build recompute the projection). This expression is the same escape
  * hatch as [[DotProduct]]: tight primitive loops over one flattened
  * plane matrix, one small method at ANY width.
  *
  * The planes are NOT data: they derive deterministically from
  * (table, plane, component) via the same md5 formula the DuckDB oracle
  * regenerates in SQL — (h48("<seed>-t-j-k") mod 2001 − 1000)/1000,
  * seed family "rp" by default ("sq"/"sf" for the sharded index's
  * routing/fine planes, which must be independent of each other and of
  * the flat index's) — so the expression carries only (nTables,
  * nPlanes, dim, seed) and equality / canonicalization work
  * structurally (the matrix is a transient lazy).
  *
  * Numeric contract, bit-identical to the declarative form it replaces:
  * each dot accumulates left-to-right from +0.0 (the [[DotProduct]] /
  * DuckDB list_reduce fold order); a null element or a length≠dim vector
  * nulls that DOT, which contributes 0 to the code (the old form's
  * `when(null ≥ 0).otherwise(0)`), never nulls the code itself.
  */
case class LshCodes(child: Expression, nTables: Int, nPlanes: Int, dim: Int,
    seed: String = "rp")
    extends UnaryExpression {

  require(nTables > 0 && nPlanes > 0 && nPlanes <= 30 && dim > 0,
    s"bad LSH shape: tables=$nTables planes=$nPlanes dim=$dim")
  require(seed.nonEmpty && !seed.contains("-"),
    s"LSH seed family '$seed' must be a non-empty dash-free prefix " +
      "(the plane id is '<seed>-t-j-k')")

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_codes expects array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lsh_codes"

  /** Flattened plane matrix [t·nPlanes·dim + j·dim + k] — the same
    * h48-derived rationals `Similarity.planeValues` bakes as literals
    * and the oracle regenerates from md5 in SQL.
    */
  @transient private lazy val planeData: Array[Double] = {
    val a = new Array[Double](nTables * nPlanes * dim)
    var t = 0
    while (t < nTables) {
      var j = 0
      while (j < nPlanes) {
        var k = 0
        while (k < dim) {
          a((t * nPlanes + j) * dim + k) =
            (Hashing.h48String(s"$seed-$t-$j-$k") % 2001 - 1000) / 1000.0
          k += 1
        }
        j += 1
      }
      t += 1
    }
    a
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val ok = v.numElements() == dim
    val codes = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var code = 0
      var j = 0
      while (j < nPlanes) {
        if (ok) {
          val base = (t * nPlanes + j) * dim
          var acc = 0.0
          var nul = false
          var k = 0
          while (k < dim && !nul) {
            if (v.isNullAt(k)) nul = true
            else { acc += planeData(base + k) * v.getDouble(k); k += 1 }
          }
          if (!nul && acc >= 0.0) code |= (1 << j)
        }
        j += 1
      }
      codes(t) = code
      t += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planeData, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val t = ctx.freshName("t"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc"); val nul = ctx.freshName("nul")
      val code = ctx.freshName("code"); val base = ctx.freshName("base")
      val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = $v.numElements() == $dim;
         |int[] $codes = new int[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  int $code = 0;
         |  if ($ok) {
         |    for (int $j = 0; $j < $nPlanes; $j++) {
         |      int $base = ($t * $nPlanes + $j) * $dim;
         |      double $acc = 0.0;
         |      boolean $nul = false;
         |      for (int $k = 0; $k < $dim; $k++) {
         |        if ($v.isNullAt($k)) { $nul = true; break; }
         |        $acc += $planesRef[$base + $k] * $v.getDouble($k);
         |      }
         |      if (!$nul && $acc >= 0.0) $code |= (1 << $j);
         |    }
         |  }
         |  $codes[$t] = $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshCodes =
    copy(child = newChild)
}
