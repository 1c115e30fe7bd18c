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

  private def loadModel(resource: String, dim: Int)
      : (BigDecimal, IndexedSeq[BigDecimal]) = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"$resource missing from classpath")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toIndexedSeq
      finally in.close()
    val Array(tag, b) = lines.head.split(" ", 2)
    require(tag == "bias", s"$resource: expected 'bias w', got '$tag'")
    val ws = lines.tail.map { line =>
      val Array(d, w) = line.split(" ", 2)
      (d.toInt, BigDecimal(w))
    }
    require(ws.size == dim && ws.map(_._1) == (0 until dim),
      s"$resource must list dims 0..${dim - 1} in order")
    (BigDecimal(b), ws.map(_._2))
  }

  /** (bias, weight per dim) from the committed artifact — kept as exact
    * BigDecimals so the plan literals and the oracle SQL text fold the
    * same values bit-for-bit.
    */
  val (bias: BigDecimal, weights: IndexedSeq[BigDecimal]) =
    loadModel("/quality_clf.txt", ClfDim)

  /** PRODUCTION-WIDTH hash space (16× the demo model): real curation
    * classifiers hash into 2^12..2^21 buckets to bound collisions, and
    * what must NOT grow with that width is the PLAN — see [[classify4k]].
    */
  val ClfDim4k = 4096

  /** The 4,096-dim artifact (`tools/train_classifier.py --synthetic`:
    * deterministic 2k-doc syllable corpus with repetition/stopword
    * pressure, labeled by the same heuristic the 256-dim model distills;
    * full-batch sparse-gradient logistic regression, 97% train
    * accuracy). Lazy: the 256-dim model stays the byte-pinned anchor.
    */
  lazy val (bias4k: BigDecimal, weights4k: IndexedSeq[BigDecimal]) =
    loadModel("/quality_clf_4k.txt", ClfDim4k)

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

  /** [[classify]] under the production-width model — and the proof that
    * the literal-riding pattern survives real hash-space sizes: the 256
    * demo weights ride as 256 `lit(...).cast` expression NODES (fine at
    * toy width, 8k nodes and a codegen blowup at 4k — lesson 11's O(3^k)
    * argmax is the same disease), so here the whole vector folds into
    * ONE `typedlit` array literal: a single expression node holding an
    * ArrayData of 4,096 decimals, executor-resident like the IVF
    * centroid matrix, plan size INDEPENDENT of model width
    * (spec-pinned: the 4k plan has fewer expression nodes than the 256
    * plan). Arithmetic contract unchanged: exact decimal fold, one
    * double division, no transcendental.
    */
  def classify4k(spark: SparkSession, dir: String): DataFrame = {
    val wArr = typedlit(weights4k)
    val perTok = transform(toks(col("text")),
      w => element_at(wArr, (Hashing.h48(w) % ClfDim4k).cast("int") + 1))
    val s = aggregate(perTok,
      lit(BigDecimal(0).underlying).cast(DecimalType(28, 6)),
      (acc, x) => (acc + x).cast(DecimalType(28, 6)))
    val logit = lit(bias4k.toDouble) +
      col("s").cast("double") / col("n_tok").cast("double")
    docs(spark, dir)
      .select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tok"), s.as("s"))
      .where(col("n_tok") > 0)
      .select(col("doc_id"), col("n_tok"), logit.as("logit"),
        (logit > 0d).as("pred"))
      .orderBy("doc_id")
  }

  val classify4kSql: String = {
    val wList = weights4k.map(_.underlying.toPlainString).mkString(", ")
    val b = bias4k.underlying.toPlainString
    s"""WITH f AS (SELECT doc_id, $duckToks AS t FROM documents),
        g AS (SELECT doc_id, len(t) AS n, unnest(t) AS w
          FROM f WHERE len(t) > 0),
        s AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tok,
            sum(CAST(([$wList]::DECIMAL(9,6)[])
              [(${Hashing.duckH48("w")} % $ClfDim4k) + 1]
              AS DECIMAL(28,6))) AS s
          FROM g GROUP BY doc_id)
        SELECT doc_id, n_tok,
          CAST($b AS DOUBLE) + CAST(s AS DOUBLE) / CAST(n_tok AS DOUBLE)
            AS logit,
          CAST($b AS DOUBLE) + CAST(s AS DOUBLE) / CAST(n_tok AS DOUBLE) > 0
            AS pred
        FROM s ORDER BY doc_id"""
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
