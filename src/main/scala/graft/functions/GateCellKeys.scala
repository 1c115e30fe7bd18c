package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd PACKED gate-cell keys: for an `array<double>` vector v,
  * returns the R·T `array<bigint>` of the streaming admission gate's
  * cell keys — ((rep·2^shardBits + rc_rep)·T + tbl)·2^finePlanes + fc_u
  * with rep = u div T, tbl = u mod T — where rc are the `replicas`
  * routing codes (plane family "sq", `shardBits` planes each) and fc
  * the R·T fine codes (family "sf", `finePlanes` each), all derived
  * exactly as two [[LshCodes]] passes would.
  *
  * WHY FUSED (round-15 gate rebuild): composing this from two LshCodes
  * columns plus a packing `transform` re-hits the §9 lesson about
  * routing a generator input through a named column — CollapseProject
  * inlines the fine-code array into every `fc[u]` reference, so the
  * R·T-table LSH evaluates R·T TIMES per row (measured: ~22 s to code a
  * 1,667-vector batch at w = 13, ~84× the single-pass cost; the same
  * blowup made the 1.05M seed a 16-minute build). One expression = one
  * evaluation of each plane family per row, packing fused in the same
  * loop, still one small generated method at any width.
  *
  * Numeric/null contract IDENTICAL to the two-LshCodes composition it
  * replaces (so the committed index layout is unchanged): plane values
  * (h48("<family>-t-j-k") mod 2001 − 1000)/1000, dots accumulating
  * left-to-right from +0.0; a null element or length ≠ dim vector
  * zeroes every code (never nulls the array) — the packed keys then
  * carry only the structural rep/tbl digits.
  */
case class GateCellKeys(child: Expression, shardBits: Int, finePlanes: Int,
    fineTables: Int, replicas: Int, dim: Int)
    extends UnaryExpression {

  require(shardBits > 0 && finePlanes > 0 && fineTables > 0 &&
    replicas > 0 && dim > 0,
    s"bad gate shape: b=$shardBits f=$finePlanes t=$fineTables " +
      s"r=$replicas dim=$dim")

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_gate_cell_keys expects array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gate_cell_keys"

  private def nKeys: Int = replicas * fineTables

  /** Same derivation as [[LshCodes]]'s plane matrix for (family, count,
    * planes): flattened [t·planes·dim + j·dim + k].
    */
  private def planesFor(family: String, tables: Int,
      planes: Int): Array[Double] = {
    val a = new Array[Double](tables * planes * dim)
    var t = 0
    while (t < tables) {
      var j = 0
      while (j < planes) {
        var k = 0
        while (k < dim) {
          a((t * planes + j) * dim + k) =
            (Hashing.h48String(s"$family-$t-$j-$k") % 2001 - 1000) / 1000.0
          k += 1
        }
        j += 1
      }
      t += 1
    }
    a
  }

  @transient private lazy val routePlanes: Array[Double] =
    planesFor("sq", replicas, shardBits)
  @transient private lazy val finePlanesData: Array[Double] =
    planesFor("sf", nKeys, finePlanes)

  private def codesOf(v: ArrayData, ok: Boolean, planes: Array[Double],
      tables: Int, width: Int): Array[Int] = {
    val codes = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var code = 0
      if (ok) {
        var j = 0
        while (j < width) {
          val base = (t * width + j) * dim
          var acc = 0.0
          var nul = false
          var k = 0
          while (k < dim && !nul) {
            if (v.isNullAt(k)) nul = true
            else { acc += planes(base + k) * v.getDouble(k); k += 1 }
          }
          if (!nul && acc >= 0.0) code |= (1 << j)
          j += 1
        }
      }
      codes(t) = code
      t += 1
    }
    codes
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val ok = v.numElements() == dim
    val rc = codesOf(v, ok, routePlanes, replicas, shardBits)
    val fc = codesOf(v, ok, finePlanesData, nKeys, finePlanes)
    val keys = new Array[Long](nKeys)
    var u = 0
    while (u < nKeys) {
      val rep = u / fineTables
      keys(u) = ((rep.toLong * (1L << shardBits) + rc(rep)) * fineTables
        + u % fineTables) * (1L << finePlanes) + fc(u)
      u += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rpRef = ctx.addReferenceObj("gateRoutePlanes", routePlanes, "double[]")
    val fpRef = ctx.addReferenceObj("gateFinePlanes", finePlanesData,
      "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val ok = ctx.freshName("ok"); val rc = ctx.freshName("rc")
      val fc = ctx.freshName("fc"); val keys = ctx.freshName("keys")
      val t = ctx.freshName("t"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val u = ctx.freshName("u")
      val acc = ctx.freshName("acc"); val nul = ctx.freshName("nul")
      val code = ctx.freshName("code"); val base = ctx.freshName("base")
      val rep = ctx.freshName("rep")
      s"""
         |boolean $ok = $v.numElements() == $dim;
         |int[] $rc = new int[$replicas];
         |int[] $fc = new int[$nKeys];
         |if ($ok) {
         |  for (int $t = 0; $t < $replicas; $t++) {
         |    int $code = 0;
         |    for (int $j = 0; $j < $shardBits; $j++) {
         |      int $base = ($t * $shardBits + $j) * $dim;
         |      double $acc = 0.0;
         |      boolean $nul = false;
         |      for (int $k = 0; $k < $dim; $k++) {
         |        if ($v.isNullAt($k)) { $nul = true; break; }
         |        $acc += $rpRef[$base + $k] * $v.getDouble($k);
         |      }
         |      if (!$nul && $acc >= 0.0) $code |= (1 << $j);
         |    }
         |    $rc[$t] = $code;
         |  }
         |  for (int $t = 0; $t < $nKeys; $t++) {
         |    int $code = 0;
         |    for (int $j = 0; $j < $finePlanes; $j++) {
         |      int $base = ($t * $finePlanes + $j) * $dim;
         |      double $acc = 0.0;
         |      boolean $nul = false;
         |      for (int $k = 0; $k < $dim; $k++) {
         |        if ($v.isNullAt($k)) { $nul = true; break; }
         |        $acc += $fpRef[$base + $k] * $v.getDouble($k);
         |      }
         |      if (!$nul && $acc >= 0.0) $code |= (1 << $j);
         |    }
         |    $fc[$t] = $code;
         |  }
         |}
         |long[] $keys = new long[$nKeys];
         |for (int $u = 0; $u < $nKeys; $u++) {
         |  int $rep = $u / $fineTables;
         |  $keys[$u] = (((long) $rep * ${1L << shardBits} + $rc[$rep])
         |    * $fineTables + $u % $fineTables)
         |    * ${1L << finePlanes} + $fc[$u];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GateCellKeys =
    copy(child = newChild)
}
