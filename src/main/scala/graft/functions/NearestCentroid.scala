package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd nearest-centroid assignment: for an `array<double>` vector
  * v, returns the 0-based index i maximizing cosine(c_i, v) over a
  * centroid matrix, ties to the LOWEST i (strict-greater keeps the
  * first maximum — the `ORDER BY cos DESC, cid ASC` convention the
  * DuckDB oracle and the struct-argmax form both implement).
  *
  * WHY AN EXPRESSION (the §9.41 lesson, third instance after
  * [[DotProduct]] and [[LshCodes]]): the declarative argmax —
  * `array_max` over one `struct(dot(lit(c_i), v)/…, -i)` entry per
  * centroid — bakes C 64-element literals into one generated
  * projection. At the fixed IVF width (C = 8) that compiles; at the
  * corpus-adaptive widths the round-12 semantic-dedup contract picks
  * (C ≈ n/2048 — 98 at sf10, thousands past it) the method blows past
  * HotSpot's compilable size and the whole assignment runs
  * INTERPRETED. This expression is one small method at ANY width:
  * tight primitive loops over a flattened centroid matrix held as a
  * referenced object.
  *
  * Numeric contract, matched to the oracle bit-for-bit: per centroid,
  * cos_i = dot(c_i, v) / (nrm(v) · cnorm_i), every dot accumulating
  * left-to-right from +0.0 (the [[DotProduct]] / DuckDB list_reduce
  * fold order) and nrm(v) recomputed with the same fold — the SAME
  * doubles the SQL twin's `duckDot(e.v, c.v) / (e.nrm * c.nrm)`
  * produces, so the strict-> comparison can never disagree with the
  * oracle's sort. A null element or a length ≠ dim vector yields
  * cid = 0 (all cosines undefined → every centroid ties → lowest
  * index), never a null — unreachable on the generated embeddings
  * tables, pinned for totality.
  *
  * Centroids ride as `IndexedSeq` constructor params (value equality —
  * raw Array params would break case-class canonicalization) and are
  * flattened once into primitive arrays per expression instance.
  */
case class NearestCentroid(child: Expression,
    cents: IndexedSeq[Double], norms: IndexedSeq[Double], dim: Int)
    extends UnaryExpression {

  require(dim > 0 && norms.nonEmpty && cents.length == norms.length * dim,
    s"bad centroid shape: cents=${cents.length} norms=${norms.length} dim=$dim")

  private def nCents: Int = norms.length

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val centData: Array[Double] = cents.toArray
  @transient private lazy val normData: Array[Double] = norms.toArray

  private def assign(v: ArrayData): Int = {
    if (v.numElements() != dim) return 0
    var nrm = 0.0
    var k = 0
    while (k < dim) {
      if (v.isNullAt(k)) return 0
      val x = v.getDouble(k)
      nrm += x * x
      k += 1
    }
    nrm = math.sqrt(nrm)
    var best = 0
    var bestCos = Double.NegativeInfinity
    var i = 0
    while (i < nCents) {
      var acc = 0.0
      var j = 0
      while (j < dim) {
        acc += centData(i * dim + j) * v.getDouble(j)
        j += 1
      }
      val cos = acc / (nrm * normData(i))
      if (cos > bestCos) { bestCos = cos; best = i }
      i += 1
    }
    best
  }

  override protected def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centMatrix", centData, "double[]")
    val normsRef = ctx.addReferenceObj("centNorms", normData, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val nrm = ctx.freshName("nrm"); val ok = ctx.freshName("ok")
      val k = ctx.freshName("k"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val cos = ctx.freshName("cos"); val best = ctx.freshName("best")
      val bestCos = ctx.freshName("bestCos"); val x = ctx.freshName("x")
      s"""
         |int $best = 0;
         |boolean $ok = $v.numElements() == $dim;
         |double $nrm = 0.0;
         |if ($ok) {
         |  for (int $k = 0; $k < $dim; $k++) {
         |    if ($v.isNullAt($k)) { $ok = false; break; }
         |    double $x = $v.getDouble($k);
         |    $nrm += $x * $x;
         |  }
         |}
         |if ($ok) {
         |  $nrm = java.lang.Math.sqrt($nrm);
         |  double $bestCos = Double.NEGATIVE_INFINITY;
         |  for (int $i = 0; $i < ${nCents}; $i++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += $centsRef[$i * $dim + $j] * $v.getDouble($j);
         |    }
         |    double $cos = $acc / ($nrm * $normsRef[$i]);
         |    if ($cos > $bestCos) { $bestCos = $cos; $best = $i; }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
