package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The declarative form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * is semantically right but interpreted: higher-order functions sit
  * outside whole-stage codegen and allocate a zipped array per row. On the
  * embedding near-dup pair join that made the fold the entire query cost
  * (~120 s at sf0.1). This expression is the engine's custom-Expression
  * escape hatch: a tight primitive loop emitted into the generated code,
  * no allocation, no virtual calls.
  *
  * Numeric contract: accumulates left-to-right from +0.0 — EXACTLY the
  * fold order of the declarative form and of the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, list_transform(...)))`, so results stay
  * bit-identical to both.
  *
  * Null contract (matches the declarative form element-for-element, which
  * is what lets [[graft.plans.RewriteDotProduct]] substitute this
  * expression for the fold): `zip_with` pads the shorter array with nulls
  * and a null product nulls the fold, so unequal lengths → null and any
  * null element → null. Hence `nullable` is true even over non-null
  * inputs.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session-scoped registration of the engine's custom expressions, so they
  * resolve through the normal function registry (callable from
  * `call_function` and SQL alike). Idempotent — safe to call per query.
  */
object Registry {
  private val dotId = FunctionIdentifier("graft_dot")
  private val chisqId = FunctionIdentifier("graft_chisq_py")

  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(dotId)) {
      reg.registerFunction(
        dotId,
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (children: Seq[Expression]) => DotProduct(children.head, children(1)))
    }
    if (!reg.functionExists(chisqId)) {
      reg.registerFunction(
        chisqId,
        new ExpressionInfo(classOf[ChiSqExact].getName, "graft_chisq_py"),
        (c: Seq[Expression]) => ChiSqExact(c(0), c(1), c(2), c(3)))
    }
  }
}
