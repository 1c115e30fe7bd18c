package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: LSH bucket-occupancy histogram and implied candidate-pair
  * volume at a given sf dir and plane count — run when the scale curve
  * flags the embedding near-dup family, to separate "occupancy variance"
  * from "true near-dup mass" (round-10 third-decade investigation).
  *
  * Usage: runMain graft.tools.LshProbe [sfDir] [planes]
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/scaledata/sf10"
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.similarity.Similarity
    val e = graft.model.Tables.loadSpread(spark, sfDir, "embeddings", "vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.dedup.Dedup.dot(col("v"), col("v"))))
    val n = e.count()
    val planes =
      if (args.length > 1) args(1).toInt else Similarity.lshPlanesFor(n)
    val tables = Similarity.lshTablesFor(planes) // width-coupled (round 11)
    val occ = Similarity.lshBuckets(e, planes, tables)
      .groupBy("tbl", "bucket").count()
    val stats = occ.agg(
      count(lit(1)).as("n_buckets"),
      max("count").as("max_occ"),
      expr("percentile(count, 0.5)").as("p50"),
      expr("percentile(count, 0.99)").as("p99"),
      sum(expr("count * (count - 1) div 2")).as("cand_pairs")).head()
    System.err.println(
      s"[lshprobe] n=$n planes=$planes tables=$tables " +
        s"buckets=${stats.getLong(0)} " +
        s"maxOcc=${stats.getLong(1)} p50=${stats.getDouble(2)} " +
        s"p99=${stats.getDouble(3)} candPairs=${stats.getLong(4)} " +
        s"(uniform would be ~${tables.toLong * n * n / (2L * (1L << planes))})")
    spark.stop()
  }
}
