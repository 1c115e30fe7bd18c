package graft.tools

import graft.Verify

/** Dev tool: execute a query and print the FINAL adaptive plan, where
  * AQE's runtime stage reuse (ReusedExchange / table cache reuse) is
  * visible — the static explain only shows the initial plan.
  */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    args.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      println(s"[reuse] $n: exchanges=$exchanges reused=$reused")
      println(plan)
    }
    spark.stop()
  }
}
