package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.RewriteDotProduct

/** The RewriteDotProduct optimizer rule: fires on the exact declarative
  * dot-product fold (either operand order), preserves the fold's value and
  * null semantics bit-for-bit, and leaves near-miss folds untouched.
  */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq(RewriteDotProduct)
    try body finally spark.experimental.extraOptimizations = prev
  }

  private def rewritten(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("graft_dot")

  private val declarativeDot: Column = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("declarative fold rewrites to graft_dot and keeps its value") {
    withRule {
      // column-dependent arrays: a constant fold would be evaluated away
      // by ConstantFolding before the rule ever saw it
      val df = spark.range(3)
        .select(array(col("id").cast("double"), lit(2.0)).as("a"),
          array(lit(3.0), lit(4.0)).as("b"))
        .select(declarativeDot.as("d"))
      assert(rewritten(df), df.queryExecution.optimizedPlan.toString)
      assert(df.as[Double].collect().toSeq.sorted == Seq(8.0, 11.0, 14.0))
    }
  }

  test("SQL spelling and commuted operands rewrite too") {
    withRule {
      val sqlForm = spark.range(1).select(expr(
        """aggregate(zip_with(array(1.0d, 2.0d), array(3.0d, 4.0d),
           (x, y) -> y * x), 0.0d, (acc, v) -> v + acc)""").as("d"))
      assert(rewritten(sqlForm), sqlForm.queryExecution.optimizedPlan.toString)
      assert(sqlForm.as[Double].collect().toSeq == Seq(11.0))
    }
  }

  test("rewrite preserves the fold's null semantics exactly") {
    def run(e: String): Option[Double] =
      spark.range(1).selectExpr(s"$e AS d").as[Option[Double]].collect().head
    val unequal = """aggregate(zip_with(array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d),
      (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)"""
    val nullElem = """aggregate(zip_with(array(1.0d, cast(null AS double)),
      array(2.0d, 3.0d), (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)"""
    val plain = (run(unequal), run(nullElem))
    val ruled = withRule { (run(unequal), run(nullElem)) }
    assert(plain == ((None, None)), s"fold semantics drifted: $plain")
    assert(ruled == plain, s"rewrite changed null semantics: $ruled vs $plain")
  }

  test("near-miss folds are left alone") {
    withRule {
      // wrong zero: a genuine fold from 1.0 is NOT a dot product
      val wrongZero = spark.range(1).select(expr(
        """aggregate(zip_with(array(1.0d, 2.0d), array(3.0d, 4.0d),
           (x, y) -> x * y), 1.0d, (acc, v) -> acc + v)""").as("d"))
      assert(!rewritten(wrongZero))
      assert(wrongZero.as[Double].collect().toSeq == Seq(12.0))
      // wrong zip lambda: sum of sums, not products
      val wrongOp = spark.range(1).select(expr(
        """aggregate(zip_with(array(1.0d, 2.0d), array(3.0d, 4.0d),
           (x, y) -> x + y), 0.0d, (acc, v) -> acc + v)""").as("d"))
      assert(!rewritten(wrongOp))
      assert(wrongOp.as[Double].collect().toSeq == Seq(10.0))
      // int arrays: different type contract, no rewrite
      val ints = spark.range(1).select(expr(
        """aggregate(zip_with(array(1, 2), array(3, 4),
           (x, y) -> x * y), 0, (acc, v) -> acc + v)""").as("d"))
      assert(!rewritten(ints))
    }
  }

  test("non-identity finish lambdas block the rewrite") {
    withRule {
      // halved dot product: dropping the finish would double the answer
      val halved = spark.range(1).select(expr(
        """aggregate(zip_with(array(1.0d, 2.0d), array(3.0d, 4.0d),
           (x, y) -> x * y), 0.0d, (acc, v) -> acc + v, s -> s / 2.0d)""").as("d"))
      assert(!rewritten(halved), halved.queryExecution.optimizedPlan.toString)
      assert(halved.as[Double].collect().toSeq == Seq(5.5))
      // L2 norm: finish = sqrt(s) over a self dot product
      val l2 = spark.range(1).select(expr(
        """aggregate(zip_with(array(3.0d, 4.0d), array(3.0d, 4.0d),
           (x, y) -> x * y), 0.0d, (acc, v) -> acc + v, s -> sqrt(s))""").as("d"))
      assert(!rewritten(l2), l2.queryExecution.optimizedPlan.toString)
      assert(l2.as[Double].collect().toSeq == Seq(5.0))
      // explicit identity finish still rewrites
      val ident = spark.range(1).select(expr(
        """aggregate(zip_with(array(1.0d, 2.0d), array(3.0d, 4.0d),
           (x, y) -> x * y), 0.0d, (acc, v) -> acc + v, s -> s)""").as("d"))
      assert(rewritten(ident), ident.queryExecution.optimizedPlan.toString)
      assert(ident.as[Double].collect().toSeq == Seq(11.0))
    }
  }

  test("DataFrame .pivot() API form equals the declared one-text pivot SQL") {
    // q_pivot's round-14 one-text conversion pins the claim it rests on:
    // .pivot() with declared values lowers to exactly the
    // FILTER-aggregate the shared SQL spells, so the API showcase and
    // the declared query are the same operator, row for row.
    val dir = "/root/testdata/sf0.001"
    val api = graft.relational.Relational.pivotOrdersApi(spark, dir)
      .collect().toSeq
    val sql = graft.relational.Relational.pivotOrders(spark, dir)
      .collect().toSeq
    assert(api.nonEmpty && api == sql)
  }
}
