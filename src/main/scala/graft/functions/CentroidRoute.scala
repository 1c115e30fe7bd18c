package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd two-level routing assignment for the SHARDED semantic-dedup
  * operator: for an `array<double>` vector v and a small routing-centroid
  * matrix, ONE pass over the centroids yields the primary shard (argmax
  * cosine, ties to the LOWEST index), the runner-up shard (the second row
  * of the same `ORDER BY cos DESC, id ASC` ranking), and the routing
  * MARGIN between them (best − second cosine) — the boundary-band signal
  * that decides whether the vector additionally joins its runner-up shard
  * as a ghost member (see `graft.similarity.Similarity.semanticDedupSharded`).
  *
  * Returned as `array<double>` `[shard, shard2, margin]` (the two ids are
  * small exact integers in double): a struct-typed expression would need
  * per-row InternalRow plumbing for no benefit, while
  * [[UnsafeArrayData.fromPrimitiveArray]] is one flat copy.
  *
  * WHY AN EXPRESSION (the §9.41 lesson, fourth instance after
  * [[DotProduct]], [[LshCodes]] and [[NearestCentroid]]): the declarative
  * form — `array_sort` over one `struct(cos_i, -i)` entry per routing
  * centroid — bakes S 64-element dot-product literals into a single
  * generated method; the shard count S grows with the corpus
  * (S ≈ ⌈n / 8.4M⌉, ~12 at 10⁸ vectors) and past ~100 entries the method
  * stops JIT-compiling exactly as the semantic assignment did at C = 98.
  * This expression is one small fixed-size method at any S.
  *
  * Numeric contract, matched to the oracle bit-for-bit: cosines follow
  * the [[NearestCentroid]] convention (left-to-right fold from +0.0 for
  * both the dot and the recomputed ‖v‖, `acc / (nrm · cnorm_i)`), and the
  * two kept rows reproduce `row_number() OVER (ORDER BY cos DESC, id
  * ASC)` at rn = 1, 2: a strictly-greater comparison keeps the first
  * (lowest-id) maximum, and the displaced best becomes the candidate
  * second. The margin is a difference of two identically-derived doubles,
  * so a strict `< ε` ghost test can never disagree across engines. A null
  * element or a length ≠ dim vector yields `[0, 1, +∞]` (degenerate →
  * primary shard 0, no ghost), never a null — unreachable on the
  * generated embeddings tables, pinned for totality. Requires ≥ 2
  * routing centroids (the operator floors S at 2).
  */
case class CentroidRoute(child: Expression,
    cents: IndexedSeq[Double], norms: IndexedSeq[Double], dim: Int)
    extends UnaryExpression {

  require(dim > 0 && norms.length >= 2 && cents.length == norms.length * dim,
    s"bad routing-centroid shape: cents=${cents.length} norms=${norms.length} dim=$dim")

  private def nCents: Int = norms.length

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_centroid_route expects array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_centroid_route"

  @transient private lazy val centData: Array[Double] = cents.toArray
  @transient private lazy val normData: Array[Double] = norms.toArray

  private def route(v: ArrayData): ArrayData = {
    var nrm = 0.0
    var ok = v.numElements() == dim
    var k = 0
    while (ok && k < dim) {
      if (v.isNullAt(k)) ok = false
      else { val x = v.getDouble(k); nrm += x * x }
      k += 1
    }
    if (!ok) return UnsafeArrayData.fromPrimitiveArray(
      Array(0.0, 1.0, Double.PositiveInfinity))
    nrm = math.sqrt(nrm)
    var best = -1; var bestCos = Double.NegativeInfinity
    var sec = -1; var secCos = Double.NegativeInfinity
    var i = 0
    while (i < nCents) {
      var acc = 0.0
      var j = 0
      while (j < dim) {
        acc += centData(i * dim + j) * v.getDouble(j)
        j += 1
      }
      val cos = acc / (nrm * normData(i))
      if (cos > bestCos) {
        secCos = bestCos; sec = best
        bestCos = cos; best = i
      } else if (cos > secCos) {
        secCos = cos; sec = i
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array(best.toDouble, sec.toDouble, bestCos - secCos))
  }

  override protected def nullSafeEval(input: Any): Any =
    route(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("routeMatrix", centData, "double[]")
    val normsRef = ctx.addReferenceObj("routeNorms", normData, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val nrm = ctx.freshName("nrm"); val ok = ctx.freshName("ok")
      val k = ctx.freshName("k"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val cos = ctx.freshName("cos"); val x = ctx.freshName("x")
      val best = ctx.freshName("best"); val bestCos = ctx.freshName("bestCos")
      val sec = ctx.freshName("sec"); val secCos = ctx.freshName("secCos")
      val out = ctx.freshName("out")
      s"""
         |boolean $ok = $v.numElements() == $dim;
         |double $nrm = 0.0;
         |if ($ok) {
         |  for (int $k = 0; $k < $dim; $k++) {
         |    if ($v.isNullAt($k)) { $ok = false; break; }
         |    double $x = $v.getDouble($k);
         |    $nrm += $x * $x;
         |  }
         |}
         |double[] $out;
         |if ($ok) {
         |  $nrm = java.lang.Math.sqrt($nrm);
         |  int $best = -1; double $bestCos = Double.NEGATIVE_INFINITY;
         |  int $sec = -1; double $secCos = Double.NEGATIVE_INFINITY;
         |  for (int $i = 0; $i < ${nCents}; $i++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += $centsRef[$i * $dim + $j] * $v.getDouble($j);
         |    }
         |    double $cos = $acc / ($nrm * $normsRef[$i]);
         |    if ($cos > $bestCos) {
         |      $secCos = $bestCos; $sec = $best;
         |      $bestCos = $cos; $best = $i;
         |    } else if ($cos > $secCos) {
         |      $secCos = $cos; $sec = $i;
         |    }
         |  }
         |  $out = new double[]{(double) $best, (double) $sec, $bestCos - $secCos};
         |} else {
         |  $out = new double[]{0.0, 1.0, Double.POSITIVE_INFINITY};
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidRoute =
    copy(child = newChild)
}
