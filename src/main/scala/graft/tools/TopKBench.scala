package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Verify
import graft.functions.TopK

/** Dev bench: row_number() window vs the bounded-buffer TopK aggregator
  * across group-size regimes. The window fully sorts every group after
  * the exchange, so its cost grows with rows-per-group; the aggregator
  * ships ≤2k buffer slots per group per MAP partition, so tiny groups pay
  * its fixed typed-agg overhead for nothing. The crossover is
  * rows-per-group vs k × mapPartitions — which is why the engine keeps
  * BOTH forms: window for wide-cardinality/small groups
  * (Relational.windowTopOrders), aggregator for few-groups/huge-members
  * (the χ² top-75-per-category shape).
  *
  * Recorded on this box (local[8], 4M rows, k=5, median of 3 after
  * warmup, Spark 4.1.2, product-encoded array buffer):
  *
  *   200,000 groups × 20 rows    window 0.97 s   aggregator 1.52 s
  *        20 groups × 200k rows  window 1.25 s   aggregator 0.53 s (2.4×)
  *
  * Same shapes on the previous Kryo-PriorityQueue buffer: 5.04 s / 0.78 s
  * — the array buffer is 3.3× faster where every group's buffer crosses
  * the shuffle, 1.5× in the few-groups regime.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._
    val nRows = 4000000L

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = runs.drop(1).map(_._1).sorted.apply(1)
      println(f"[topk-bench] $label%-24s median=$med%.2f s rows=${runs.head._2}")
    }

    for (nGroups <- Seq(200000, 20)) {
      val df = spark.range(nRows).select(
          (col("id") % nGroups).as("grp"),
          concat(lit("t"), col("id")).as("tag"),
          (hash(col("id")).cast("double") / 1000.0).as("score"))
        .persist()
      df.count() // materialize
      val w = Window.partitionBy("grp").orderBy(col("score").desc, col("tag").asc)
      time(s"window/$nGroups") {
        df.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
          .drop("rn").count()
      }
      time(s"aggregator/$nGroups") {
        TopK.topKPerGroup(df.toDF(), "grp", "tag", "score", 5).count()
      }
      df.unpersist()
    }
    spark.stop()
  }
}
