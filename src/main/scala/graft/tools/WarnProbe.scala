package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run every declared query with a stderr marker before each,
  * so WARN lines (e.g. WindowExec "No Partition Defined") attribute to a
  * query by position in the log. Not part of the library surface.
  */
object WarnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark: SparkSession = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"### $name")
      System.err.flush()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"### $name FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
