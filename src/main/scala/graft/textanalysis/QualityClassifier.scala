package graft.textanalysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Hashing
import TextAnalysis.{docs, toks, duckToks}

/** fastText-style linear quality classifier: logistic regression over the
  * feature-hashed bag of words, applied from a committed weight artifact
  * (`src/main/resources/quality_clf.txt`, trained offline by
  * `tools/train_classifier.py` — the stopword/BPE artifact pattern as a
  * MODEL file). This is the production shape of every learned curation
  * filter (CCNet / LLaMA quality classifiers): train once offline,
  * broadcast a small weight vector, score the corpus in one narrow pass.
  *
  * logit = bias + (Σ_tokens w[h48(tok) mod ClfDim]) / n_tok — the dot
  * product of the mean hashed-BoW feature vector with the weights, folded
  * PER TOKEN (Σ_d w_d·tf_d = Σ_tok w_{dim(tok)}), so no tf vector is ever
  * materialized: one in-row transform + exact decimal fold, no explode,
  * no shuffle, scan speed at any scale. The weights fold into the plan as
  * 256 decimal literals (executor-resident, like the IVF centroids).
  *
  * Parity: weights are 6-decimal fixed point, the fold is exact decimal
  * arithmetic (order-free), and the logit is one double division plus one
  * add of identically-rounded literals — engine-exact, no transcendental.
  * The sigmoid is deliberately NOT applied: it is monotone, so the
  * decision (logit > 0) and any ranking/thresholding are identical on the
  * logit, and `exp` is the one thing JVM and libm disagree on at 1 ulp.
  */
object QualityClassifier {

  /** Hash-space width of the committed model (independent of the 32-dim
    * demo vectorizer [[TextAnalysis.HashVecDim]] — a real filter wants
    * fewer collisions than a fixture wants).
    */
  val ClfDim = 256

  /** (bias, weight per dim) from the committed artifact — kept as exact
    * BigDecimals so the plan literals and the oracle SQL text fold the
    * same values bit-for-bit.
    */
  val (bias: BigDecimal, weights: IndexedSeq[BigDecimal]) = {
    val in = getClass.getResourceAsStream("/quality_clf.txt")
    require(in != null, "quality_clf.txt missing from classpath")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toIndexedSeq
      finally in.close()
    val Array(tag, b) = lines.head.split(" ", 2)
    require(tag == "bias", s"quality_clf.txt: expected 'bias w', got '$tag'")
    val ws = lines.tail.map { line =>
      val Array(d, w) = line.split(" ", 2)
      (d.toInt, BigDecimal(w))
    }
    require(ws.size == ClfDim && ws.map(_._1) == (0 until ClfDim),
      s"quality_clf.txt must list dims 0..${ClfDim - 1} in order")
    (BigDecimal(b), ws.map(_._2))
  }

  /** Score every document: (doc_id, n_tok, logit, pred), pred = logit>0.
    * One narrow pass (see object doc); empty-token docs are out of the
    * model's domain and filtered, matching [[TextAnalysis.qualityScore]].
    */
  def classify(spark: SparkSession, dir: String): DataFrame = {
    val wArr = array(weights.map(w =>
      lit(w.underlying).cast(DecimalType(9, 6))): _*)
    val perTok = transform(toks(col("text")),
      w => element_at(wArr, (Hashing.h48(w) % ClfDim).cast("int") + 1))
    val s = aggregate(perTok,
      lit(BigDecimal(0).underlying).cast(DecimalType(28, 6)),
      (acc, x) => (acc + x).cast(DecimalType(28, 6)))
    val logit = lit(bias.toDouble) +
      col("s").cast("double") / col("n_tok").cast("double")
    docs(spark, dir)
      .select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tok"), s.as("s"))
      .where(col("n_tok") > 0)
      .select(col("doc_id"), col("n_tok"), logit.as("logit"),
        (logit > 0d).as("pred"))
      .orderBy("doc_id")
  }

  val classifySql: String = {
    val wList = weights.map(_.underlying.toPlainString).mkString(", ")
    val b = bias.underlying.toPlainString
    s"""WITH f AS (SELECT doc_id, $duckToks AS t FROM documents),
        g AS (SELECT doc_id, len(t) AS n, unnest(t) AS w
          FROM f WHERE len(t) > 0),
        s AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tok,
            sum(CAST(([$wList]::DECIMAL(9,6)[])
              [(${Hashing.duckH48("w")} % $ClfDim) + 1]
              AS DECIMAL(28,6))) AS s
          FROM g GROUP BY doc_id)
        SELECT doc_id, n_tok,
          CAST($b AS DOUBLE) + CAST(s AS DOUBLE) / CAST(n_tok AS DOUBLE)
            AS logit,
          CAST($b AS DOUBLE) + CAST(s AS DOUBLE) / CAST(n_tok AS DOUBLE) > 0
            AS pred
        FROM s ORDER BY doc_id"""
  }
}
