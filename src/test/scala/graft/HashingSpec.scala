package graft

import org.apache.spark.sql.functions._
import graft.functions.{H48, Hashing}

/** The fused H48 expression must be bit-identical to the composed
  * conv(substring(md5,1,12),16,10) spelling it replaced — every DuckDB
  * oracle twin and persisted hash depends on that equivalence.
  */
class HashingSpec extends SparkSpec {
  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  test("fused H48 equals the composed md5-hex spelling on real tokens") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
    val diff = toks
      .select(Hashing.h48(col("w")).as("fused"), composed(col("w")).as("comp"))
      .where(col("fused") =!= col("comp"))
      .count()
    assert(diff == 0L)
  }

  test("fused H48 matches the driver-side h48String and handles edge inputs") {
    val cases = Seq("", "a", "hello world", "é über 日本語", "x" * 10000)
    val got = cases.toDF("s").select(Hashing.h48(col("s"))).as[Long].collect()
    assert(got.toSeq == cases.map(Hashing.h48String))
    assert(got.forall(v => v >= 0 && v < (1L << 48)))
  }

  test("H48 evaluates identically interpreted and codegen'd") {
    // force the interpreted path via eval on a literal
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = H48(Literal("spark".getBytes("UTF-8")))
    assert(e.eval(null) == Hashing.h48String("spark"))
  }

  test("null input yields null, not a crash") {
    val got = Seq[Option[String]](Some("a"), None).toDF("s")
      .select(Hashing.h48(col("s"))).as[Option[Long]].collect()
    assert(got.count(_.isEmpty) == 1)
  }
}
