package graft
/** Dev smoke: runs the driver's entry contract exactly as the driver does
  * (rows>0 on sf0.001) and prints the result. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows=$n schema=${df.schema.map(_.name).mkString(",")}")
    df.show(5, 40)
    spark.stop()
  }
}
