package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sample = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, String, Double)].collect().toSet

  test("csv round-trip preserves rows under explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Sources.writeCsv(sample, dir)
    assert(rows(Sources.readCsv(spark, sample.schema, dir)) == rows(sample))
  }

  test("json round-trip preserves rows under explicit schema") {
    val dir = Files.createTempDirectory("graft_json").toString
    Sources.writeJson(sample, dir)
    assert(rows(Sources.readJson(spark, sample.schema, dir)) == rows(sample))
  }

  test("orc round-trip preserves rows under explicit schema") {
    val dir = Files.createTempDirectory("graft_orc").toString
    Sources.writeOrc(sample, dir)
    assert(rows(Sources.readOrc(spark, sample.schema, dir)) == rows(sample))
  }

  test("compact rewrites a many-file table into n files, rows preserved") {
    val in = Files.createTempDirectory("graft_many").toString
    val out = Files.createTempDirectory("graft_compact").toString
    sample.repartition(16).write.mode("overwrite").parquet(in)
    Sources.compact(spark, in, out, 2)
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 2)
    assert(rows(Sources.readParquet(spark, out)) == rows(sample))
  }

  test("parquet file-source stream drains directory drops as micro-batches") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val schema = sample.schema
    sample.limit(100).write.mode("append").parquet(dir)
    val q = graft.streaming.StreamingOps.parquetStream(spark, schema, dir)
      .groupBy("o_orderstatus").count()
      .writeStream.format("memory").queryName("filestream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val first = spark.table("filestream").as[(String, Long)].collect().toMap
      assert(first.values.sum == 100)
      sample.limit(150).write.mode("append").parquet(dir) // second drop
      q.processAllAvailable()
      val second = spark.table("filestream").as[(String, Long)].collect().toMap
      assert(second.values.sum == 250)
    } finally q.stop()
  }

  test("partitioned parquet prunes partitions on the filter") {
    val dir = Files.createTempDirectory("graft_part").toString
    Sources.writePartitioned(sample, "o_orderstatus", dir)
    val filtered = Sources.readParquet(spark, dir)
      .where(col("o_orderstatus") === "F")
    // value-level: same rows as filtering the original
    assert(filtered.count() == sample.where(col("o_orderstatus") === "F").count())
    // plan-level: the filter must land in PartitionFilters, not a Filter node
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("o_orderstatus"))
    assert(!filtered.queryExecution.executedPlan.toString.contains("Filter ("),
      "partition filter should be pruned at the source, not post-scan")
  }
}
