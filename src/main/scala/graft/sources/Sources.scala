package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** Materialize a corpus as shuffled training shards: hive-partitioned
    * by shard, rows sorted by the deterministic hash key — the layout a
    * training loader streams round-robin for a reproducible
    * pseudo-random example order. Assignment and key come from
    * [[graft.textanalysis.CorpusOps.shardKey]], and `nShards` DEFAULTS
    * to [[graft.textanalysis.CorpusOps.NShards]] — at that default the
    * written files match the declared `corpusShards` manifest
    * byte-for-byte; any other count is a deliberately different layout
    * (the spec exercises 4). The input must not already carry `shard` or
    * `sort_key` columns (they are this writer's outputs); the method
    * fails fast rather than silently overwriting caller data.
    *
    * RANGE-partitioned on (shard, sort_key, id), not hash-partitioned
    * on the shard id: murmur3(shard) mod n is not a bijection, so hash
    * partitioning collides distinct shards onto one task (~37 % of
    * tasks empty, worst task carrying 3-4 shards — a built-in
    * straggler), while ranges give every task a contiguous,
    * SAMPLED-size-balanced slice; an oversized shard simply spans two
    * tasks. A shard dir then holds one file per covering task, and
    * part-file names embed the partition id, so reading a shard's files
    * in NAME order yields the globally sorted stream — the same
    * contract one file would give.
    */
  def writeShuffledShards(df: DataFrame, idCol: String, path: String,
      nShards: Int = graft.textanalysis.CorpusOps.NShards): Unit = {
    val clash = df.columns.toSet.intersect(Set("shard", "sort_key"))
    require(clash.isEmpty,
      s"writeShuffledShards writes columns ${clash.mkString(", ")}; " +
        "rename or drop them on the input first")
    val key = graft.textanalysis.CorpusOps.shardKey(col(idCol))
    df.withColumn("sort_key", key)
      .withColumn("shard", (key % nShards).cast("int"))
      .repartitionByRange(nShards, col("shard"), col("sort_key"), col(idCol))
      .sortWithinPartitions("shard", "sort_key", idCol)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Morton (Z-order) interleave of two integer keys, as a pure codegen'd
    * Column expression: bit i of `a` lands at result bit 2i, bit i of `b`
    * at 2i+1, via the standard 5-step magic-mask spread. Inputs are
    * truncated to their low 31 bits so the result stays a positive
    * signed long (ordering-safe); at 100 TB layout keys are bucketed far
    * coarser than 31 bits anyway.
    */
  def zorder2(a: Column, b: Column): Column = {
    def spread(c: Column): Column = {
      val steps = Seq(
        16 -> 0x0000FFFF0000FFFFL,
        8  -> 0x00FF00FF00FF00FFL,
        4  -> 0x0F0F0F0F0F0F0F0FL,
        2  -> 0x3333333333333333L,
        1  -> 0x5555555555555555L)
      steps.foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
        case (x, (s, mask)) =>
          x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(mask))
      }
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-ordered layout: range-partition + sort by the Morton key of two
    * filter columns, then write. Every output file then covers a compact
    * rectangle in (colA, colB) space, so parquet min/max stats prune
    * files for predicates on EITHER column — the multi-dimensional
    * data-skipping a single-column sort cannot give (sorting by A leaves
    * B uniform across every file).
    *
    * Both axes are first NORMALIZED to a 16-bit grid from their observed
    * min/max (one tiny agg action): raw interleaving degenerates to
    * wider-axis-major ordering whenever the domains have unequal bit
    * widths (a 13-bit orderkey vs an 8-bit custkey leaves the narrow
    * axis unbounded per file — caught by `SourcesSpec`'s range
    * measurement). Exact long arithmetic; constant columns map to 0.
    */
  def writeZOrdered(
      df: DataFrame, colA: String, colB: String, path: String,
      nFiles: Int): Unit = {
    val Seq(loA, hiA, loB, hiB) = df
      .agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
        min(col(colB)).cast("long"), max(col(colB)).cast("long"))
      .collect().head.toSeq.map(_.asInstanceOf[Long])
    def grid(c: Column, lo: Long, hi: Long): Column =
      ((c.cast("long") - lit(lo)) * lit(65535L)) / lit(math.max(hi - lo, 1L))
    df.withColumn("_z",
        zorder2(grid(col(colA), loA, hiA), grid(col(colB), loB, hiB)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

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

  /** Bucketed catalog table: rows hash-partitioned into `nBuckets` files
    * per write-task group by `bucketCol`, bucket-sorted within each file —
    * Spark's persisted co-location contract. Two tables bucketed on their
    * join key with the SAME bucket count join with NO shuffle exchange on
    * either side (the SortMergeJoin reads matching buckets file-by-file);
    * repeated fact-fact joins at 100 TB amortize their exchange to write
    * time once instead of paying it per query. BucketJoinSpec proves the
    * exchange-free plan on a real write+join round trip.
    *
    * Catalog tables only — bucket metadata lives in the metastore, not in
    * the parquet files, so a plain `.parquet(path)` read of the same files
    * would NOT get the co-location (Spark cannot trust unknown layouts).
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      bucketCol: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
}
