package graft.tools

import org.apache.spark.sql.functions._

/** Dev ablation probe for the inverted-index pair family: times each
  * sub-stage of the prefix-filtered intersection pipeline in isolation
  * (noop sink, one warm + one measured run each) so regressions and
  * optimizations can be attributed to a specific piece rather than
  * guessed from stage ids.
  *
  * Usage: runMain graft.tools.PairAblate [sfDir]
  */
object PairAblate {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.dedup.Dedup
    def docs = graft.model.Tables.loadSpread(spark, sfDir, "documents", "doc_id")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      System.err.println(f"[ablate] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    time("shingles")(Dedup.shingles(docs))
    time("posts") {
      Dedup.shingles(docs).withColumnRenamed("shingle_h", "h")
        .groupBy("h").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .where(size(col("ds")) <= Dedup.MaxShingleDf)
    }
    time("docsAgg") {
      val posts = Dedup.shingles(docs).withColumnRenamed("shingle_h", "h")
        .groupBy("h").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .where(size(col("ds")) <= Dedup.MaxShingleDf)
      posts.select(col("h"), size(col("ds")).as("df"),
          explode(col("ds")).as("doc_id"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("fh"),
          count(lit(1)).as("sz"))
    }
    time("cand") {
      val posts = Dedup.shingles(docs).withColumnRenamed("shingle_h", "h")
        .groupBy("h").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .where(size(col("ds")) <= Dedup.MaxShingleDf)
      val kept = posts.select(col("h"), size(col("ds")).as("df"),
        explode(col("ds")).as("doc_id"))
      val dcs = kept.groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("fh"),
          count(lit(1)).as("sz"))
      val prefLen =
        expr(s"cast(sz - ((sz * 4 + 4) div 5) + 1 as int)")
      val prefix = dcs
        .select(col("doc_id"), explode(slice(col("fh"), lit(1), prefLen)).as("f"))
        .select(col("doc_id"), col("f.h").as("h"))
      prefix.join(posts.where(size(col("ds")) > 1), "h")
        .select(col("doc_id").as("pa"), explode(col("ds")).as("pb"))
        .where(col("pa") =!= col("pb"))
        .select(least(col("pa"), col("pb")).as("doc_a"),
          greatest(col("pa"), col("pb")).as("doc_b"))
        .distinct()
    }
    time("full(jaccardPairs)")(Dedup.jaccardPairsFrom(docs))
    spark.stop()
  }
}
