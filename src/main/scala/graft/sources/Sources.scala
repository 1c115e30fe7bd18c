package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the reference's JSON-lines + text part files
  * (SURVEY.md §2 rows 1-7): schema-explicit CSV/JSON/parquet round-trips
  * and hive-style partitioned parquet layout.
  *
  * Policy: every reader takes an EXPLICIT schema — schema inference is a
  * full extra pass over the data at 100 TB and non-deterministic under
  * sampling; production tables declare their types.
  *
  * Partitioned writes: `writePartitioned` lays out `dir/col=value/...` so
  * any engine (Spark, DuckDB, Trino) prunes partitions from the path alone;
  * readers get partition pruning for free on equality/IN filters over the
  * partition column (visible as PartitionFilters in the scan node).
  */
object Sources {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC round-trip — same columnar guarantees as parquet (predicate
    * pushdown, column pruning, vectorized read) for shops standardized on
    * ORC. Parquet stays the engine's default interchange format.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Hive-style partitioned parquet: one directory per partition value.
    * Choose a LOW-cardinality column (hundreds, not millions — small-file
    * explosion otherwise); at 100 TB this is the primary pruning axis
    * (e.g. date, category).
    */
  def writePartitioned(df: DataFrame, partitionCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Compact a directory into `nFiles` parquet files — the small-files
    * remedy (a 100 TB table accreted from streaming micro-batches ends up
    * as millions of KB-files; scans then pay per-file open cost and the
    * driver pays per-file listing). Reads, round-robin repartitions
    * (coalesce would skip the shuffle but inherits skewed input file
    * sizes), rewrites.
    */
  def compact(spark: SparkSession, path: String, out: String, nFiles: Int): Unit =
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(out)
}
