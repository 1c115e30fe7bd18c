package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Adversarial-skew corpus builder (round-10 verdict ask 5): copies an
  * amplified sf dir and PLANTS three pathologies the engine's skew
  * defenses claim to absorb, so the claims can be measured at scale
  * rather than spec-proven at fixture size:
  *
  *   - MEGA-DOMAIN: 20% of documents rewritten to one `source`
  *     (domain = source+".example.com" in `q_domain_caps`), so one
  *     domain owns a fifth of the corpus — the per-domain rank window's
  *     worst case; the defense is that the window sort caps at the
  *     domain's own size and every other domain is untouched.
  *   - HOT SHINGLE: a fixed 12-token sentence appended to 10% of
  *     documents — its shingles' document frequency explodes past the
  *     df-ceiling, which must cut the hot shingles from BOTH pair
  *     emission and size accounting in `q_dedup_jaccard` (otherwise
  *     candidate pairs grow by |hot docs|² ≈ 25M from this one plant).
  *   - CELEBRITY USER: 10% of events remapped to one user_id — the
  *     sessionization window's hot partition (`q_events_sessions`); the
  *     defense is that a single user's partition sorts alone while the
  *     other 90% of the stream parallelizes unchanged.
  *
  * Everything else copies byte-identical, so a paired bench
  * (sf1 vs sf1skew) isolates the planted skew's cost. Not an oracle
  * target — this dir exists to measure skew penalties, recorded in
  * SURVEY §9.
  *
  * Usage: runMain graft.tools.PlantSkew [src] [out]
  * (defaults: scaledata/sf1 → scaledata/sf1skew).
  */
object PlantSkew {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "scaledata/sf1"
    val out = if (args.length > 1) args(1) else "scaledata/sf1skew"
    val marker = Paths.get(out, "_SKEWED")
    if (Files.exists(marker)) {
      System.err.println(s"[plantskew] $out already planted, nothing to do")
      return
    }
    val spark = graft.Verify.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Files.createDirectories(Paths.get(out))
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: org.apache.spark.sql.DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "embeddings"))
      write(read(t), t)

    val hotSentence = " the quick brown fox jumps over the lazy dog " +
      "again and again and again"
    write(read("documents")
      .withColumn("source",
        when(col("doc_id") % 5 === 0, lit("megadomain"))
          .otherwise(col("source")))
      .withColumn("text",
        when(col("doc_id") % 10 === 0 && col("text").isNotNull,
          concat(col("text"), lit(hotSentence))).otherwise(col("text")))
      .withColumn("n_chars",
        when(col("doc_id") % 10 === 0 && col("text").isNotNull,
          length(col("text"))).otherwise(col("n_chars"))),
      "documents")

    write(read("events")
      .withColumn("user_id",
        when(col("event_id") % 10 === 0, lit(42L)).otherwise(col("user_id"))),
      "events")

    Files.write(marker,
      (s"src=$src megadomain=doc_id%5 hotshingle=doc_id%10 " +
        "celebrity=user42@event_id%10\n").getBytes("UTF-8"))
    for (t <- Seq("documents", "events"))
      System.err.println(
        s"[plantskew] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    spark.stop()
  }
}
