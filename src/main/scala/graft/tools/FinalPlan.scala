package graft.tools

/** Dev tool: run one declared query to completion (noop sink, warm + one
  * measured pass) and print the FINAL adaptive physical plan with runtime
  * metrics — `explain("formatted")` only shows the pre-AQE initial plan,
  * so stage-level diagnoses (which exchanges were reused, what AQE
  * coalesced, where single-task stages come from) need the executed plan.
  *
  * Usage: runMain graft.tools.FinalPlan <query> [sfDir]
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "q_dedup_jaccard"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    // the noop write runs its own QueryExecution, so the AQE-final plan
    // must come from a listener, not from the source DataFrame
    @volatile var finalPlan: String = ""
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          finalPlan = qe.executedPlan.toString
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    val df = fn(spark, sfDir)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[finalplan] $name measured run: $sec%.2f s")
    try org.apache.spark.GraftCoreBridge.drainListeners(spark.sparkContext)
    catch { case _: Throwable => () }
    Thread.sleep(500)
    println(finalPlan)
    spark.stop()
  }
}
