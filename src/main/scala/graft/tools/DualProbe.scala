package graft.tools

/** One-text conversion scout: for each declared query, try running its
  * DuckDB oracle SQL through `spark.sql` over the standard views and
  * compare the collected result to the declared implementation's — a
  * query whose oracle text already executes identically in Spark is a
  * free dual-use conversion (the round-by-round one-text contract).
  * Events-table queries are skipped (the ts column is TIMESTAMP_NS in
  * DuckDB but a raw long under the session's nanosAsLong flag, so no
  * one text can name it identically).
  *
  * Usage: runMain graft.tools.DualProbe [sfDir] [q_name ...]
  */
object DualProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = graft.Verify.session("8")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      graft.model.Tables.load(spark, dir, t).createOrReplaceTempView(t)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    for (n <- names; sql <- graft.SparkEntry.oracleSql.get(n)) {
      val r = try {
        val viaSql = spark.sql(sql)
        val want = graft.SparkEntry.queries(n)(spark, dir)
        if (viaSql.columns.toSeq != want.columns.toSeq)
          s"COLS ${viaSql.columns.toSeq} vs ${want.columns.toSeq}"
        else {
          val a = viaSql.collect().map(_.toString).sorted
          val b = want.collect().map(_.toString).sorted
          if (a.toSeq == b.toSeq) "MATCH"
          else s"DIFF rows=${a.length}/${b.length} first=${
            a.zip(b).find(p => p._1 != p._2).map(_.toString().take(120))}"
        }
      } catch { case e: Throwable =>
        "ERR " + e.toString.linesIterator.next().take(160)
      }
      println(s"[dualprobe] $n -> $r")
    }
    spark.stop()
  }
}
