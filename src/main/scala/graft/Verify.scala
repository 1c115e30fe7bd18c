package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def session(cpus: String): SparkSession = session(cpus, null)

  /** `localDir` (optional) overrides spark.local.dir — graft.Bench points
    * it at tmpfs for the sf1/sf10 scale runs: the sandbox's single virtio
    * disk write-throttles the bench's own multi-GB shuffle files, which
    * made sf10 wall-clock swing 39–132 s at byte-identical work (run
    * progression in SURVEY §9.39); a production cluster's NVMe-backed
    * shuffle dirs don't have this failure mode, and RAM-backed local
    * dirs change neither plans nor shuffle bytes — only the timing
    * noise floor.
    */
  def session(cpus: String, localDir: String): SparkSession = {
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
    val spark = (if (localDir == null) b0
                 else b0.config("spark.local.dir", localDir))
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); Spark 4 only reads it as a
      // raw long with this flag (graft.model.Tables.withEventTime).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferFiltersFromGenerate duplicates the generator's input
      // expression into isnotnull/size>0 filters that predicate pushdown
      // then drags below every exchange — for the md5-shingle pipelines
      // that re-evaluates the whole array expression per SOURCE row in the
      // (single-task) scan stage: measured 12 s of a 17 s query. The
      // filters only skip null/empty arrays, which our generators never
      // produce.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.ensure(spark)
    // session-scoped optimizer rule: declaratively-written dot-product
    // folds become the codegen'd DotProduct expression (clusters built by
    // the platform use spark.sql.extensions=graft.plans.GraftExtensions)
    spark.experimental.extraOptimizations = Seq(graft.plans.RewriteDotProduct)
    spark
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing names restrict the dump (dev iteration; the round
    // driver always runs the full set)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = session(cpus)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
