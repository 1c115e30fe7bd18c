package graft.tools

/** Per-stage wall/CPU breakdown of one declared query — the "where did
  * the seconds go" diagnostic behind SURVEY §9's stage-level claims.
  * Prints each completed stage's duration, task count, shuffle bytes and
  * executor CPU, then the total.
  *
  * Usage: runMain graft.tools.StageProbe <query> [sfDir] [runs]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "q_dedup_jaccard"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val m = i.taskMetrics
          val wall = (for (a <- i.completionTime; b <- i.submissionTime)
            yield a - b).getOrElse(-1L)
          stages.add(f"[stage] ${i.stageId}%3d ${i.name.take(60)}%-60s " +
            f"wall=${wall / 1e3}%7.2fs tasks=${i.numTasks}%3d " +
            f"cpu=${m.executorCpuTime / 1e9}%7.2fs " +
            f"run=${m.executorRunTime / 1e3}%7.2fs " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2fMB")
        }
      })
    val fn = graft.SparkEntry.queries(name)
    for (r <- 1 to runs) {
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      try org.apache.spark.GraftCoreBridge.drainListeners(spark.sparkContext)
      catch { case _: Throwable => () }
      System.err.println(s"[stageprobe] $name run $r: " +
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(sec)) + " s")
      stages.forEach(s => System.err.println(s))
    }
    spark.stop()
  }
}
