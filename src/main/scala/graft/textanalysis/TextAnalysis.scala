package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.functions.Hashing
import graft.functions.Hashing.{P, duckH48p}

/** Document-level text analysis for a training-data pipeline: token
  * counting, quality scoring, n-gram language identification, and content
  * fingerprinting. All four are single-pass narrow projections (plus one
  * tiny groupBy where noted) — at 100 TB each is one embarrassingly
  * parallel scan with full column pruning (only `doc_id`/`text` read).
  *
  * Double-valued scores are built from single divisions of exact integers
  * with an explicit operand order mirrored in the DuckDB oracle, so values
  * hash-match bit-exactly.
  */
object TextAnalysis {

  private[textanalysis] def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(spark, dir, "documents", "doc_id")

  // coalesce first: a NULL text would otherwise null-propagate through
  // split/filter/size and emit null-stat rows instead of zero-stat rows
  private[textanalysis] def toks(c: Column): Column =
    filter(split(lower(coalesce(c, lit(""))), "\\s+"), w => length(w) > 0)

  private[textanalysis] val duckToks =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"""

  // ------------------------------------------------------------- counting

  /** BPE-ish pre-tokenization regex: letter runs | single digits | any
    * other non-space symbol — the shape GPT-style byte-pair pretokenizers
    * use (letters chunk, digits split, punctuation isolated). Kept to a
    * Java/RE2-common subset so Spark and DuckDB agree.
    */
  val BpeTokenRegex = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  /** Per-document token statistics: whitespace tokens, distinct tokens,
    * BPE-ish subword count, chars. Pure projection — no shuffle. The token
    * array is materialized once per row (higher-order lambdas are outside
    * codegen CSE, so naive repetition re-splits the text per column).
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("text"), toks(col("text")).as("t"))
      .select(
        col("doc_id"),
        size(col("t")).as("n_tokens"),
        size(array_distinct(col("t"))).as("n_distinct"),
        size(regexp_extract_all(lower(col("text")), lit(BpeTokenRegex), lit(0)))
          .as("n_bpe"),
        length(col("text")).as("n_chars"))
      .orderBy("doc_id")

  val tokenStatsSql: String =
    s"""SELECT doc_id,
        CAST(len($duckToks) AS INT) AS n_tokens,
        CAST(len(list_distinct($duckToks)) AS INT) AS n_distinct,
        CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]'))
          AS INT) AS n_bpe,
        CAST(len(text) AS INT) AS n_chars
        FROM documents ORDER BY doc_id"""

  // -------------------------------------------------------------- quality

  /** English-ish stopwords used for the quality ratio (a quality signal:
    * natural prose has a stable stopword share; keyword spam does not).
    */
  val QualityStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "on", "for")

  /** Per-document quality features + composite score:
    *   stop_ratio  = stopword tokens / tokens
    *   ttr         = distinct tokens / tokens        (type-token ratio)
    *   avg_wlen    = chars-in-tokens / tokens
    *   score       = 0.4·stop_ratio + 0.4·ttr + 0.2·min(avg_wlen,8)/8
    * Single narrow pass; every ratio is one exact-int division.
    */
  // quality feature expressions over a token-array column named "t" —
  // shared by [[qualityScore]] and the fused [[corpusClean]] pass
  private def stopRatioExpr: Column = {
    val t = col("t")
    size(filter(t, w => w.isInCollection(QualityStopwords))).cast("double") /
      size(t).cast("double")
  }
  private def ttrExpr: Column =
    size(array_distinct(col("t"))).cast("double") / size(col("t")).cast("double")
  private def avgWlenExpr: Column =
    aggregate(col("t"), lit(0), (acc, w) => acc + length(w)).cast("double") /
      size(col("t")).cast("double")
  private[textanalysis] def qualityExpr: Column =
    lit(0.4) * stopRatioExpr + lit(0.4) * ttrExpr +
      lit(0.2) * least(avgWlenExpr, lit(8.0)) / lit(8.0)

  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .where(size(col("t")) > 0)
      .select(col("doc_id"), stopRatioExpr.as("stop_ratio"), ttrExpr.as("ttr"),
        avgWlenExpr.as("avg_wlen"), qualityExpr.as("quality"))
      .orderBy("doc_id")

  val qualityScoreSql: String = {
    val inList = QualityStopwords.map(w => s"'$w'").mkString("(", ", ", ")")
    s"""WITH f AS (SELECT doc_id, $duckToks AS t FROM documents)
        SELECT doc_id,
          CAST(len(list_filter(t, w -> w IN $inList)) AS DOUBLE)
            / CAST(len(t) AS DOUBLE) AS stop_ratio,
          CAST(len(list_distinct(t)) AS DOUBLE)
            / CAST(len(t) AS DOUBLE) AS ttr,
          CAST(list_reduce(list_prepend(0, list_transform(t, w -> len(w))),
              (acc, x) -> acc + x) AS DOUBLE)
            / CAST(len(t) AS DOUBLE) AS avg_wlen,
          0.4 * (CAST(len(list_filter(t, w -> w IN $inList)) AS DOUBLE)
                 / CAST(len(t) AS DOUBLE))
          + 0.4 * (CAST(len(list_distinct(t)) AS DOUBLE)
                   / CAST(len(t) AS DOUBLE))
          + 0.2 * least(CAST(list_reduce(list_prepend(0,
                list_transform(t, w -> len(w))), (acc, x) -> acc + x) AS DOUBLE)
                / CAST(len(t) AS DOUBLE), 8.0) / 8.0 AS quality
        FROM f WHERE len(t) > 0 ORDER BY doc_id"""
  }

  // -------------------------------------------------------------- lang id

  /** Marker-word profiles for the n-gram/marker language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "como"))

  /** Language ID: count marker hits per language, predict the argmax
    * (ties → lexicographically first language, no hits → 'und').
    * One narrow pass; the actual `lang` column rides along for accuracy
    * inspection downstream.
    */
  /** Marker-argmax language prediction over a token-array column named
    * "t" — shared by [[langId]] and the fused [[corpusClean]] pass.
    * Fold keeps the strictly-greater score (ties → lexicographically
    * first language); no hits → 'und'. (The small fixed language count
    * keeps the when-fold's expression duplication harmless here, unlike
    * the IVF argmax — k=4 strings, not k=8 64-double vectors.)
    */
  private def predLangExpr: Column = {
    val t = col("t")
    val hits = LangMarkers.map { case (lang, ms) =>
      (lang, size(filter(t, w => w.isInCollection(ms))))
    }
    val (bestLang, _) = hits.tail.foldLeft[(Column, Column)](
      (lit(hits.head._1), hits.head._2)) { case ((bl, bs), (lang, s)) =>
      (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    val anyHit = hits.map(_._2).reduce(_ + _) > 0
    when(anyHit, bestLang).otherwise(lit("und"))
  }

  def langId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("lang"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("lang"), predLangExpr.as("pred_lang"))
      .orderBy("doc_id")

  val langIdSql: String = {
    def cnt(ms: Seq[String]) = {
      val in = ms.map(w => s"'$w'").mkString("(", ", ", ")")
      s"len(list_filter(t, w -> w IN $in))"
    }
    val scores = LangMarkers.map { case (l, ms) => s"${cnt(ms)} AS c_$l" }.mkString(", ")
    val langs = LangMarkers.map(_._1)
    // same fold: strictly-greater wins, seq order
    val best = langs.tail.foldLeft(s"'${langs.head}'") { (acc, l) =>
      s"(CASE WHEN c_$l > ${langs.take(langs.indexOf(l)).map(x => s"c_$x").mkString("greatest(", ", ", ")")} THEN '$l' ELSE $acc END)"
    }
    val total = langs.map(l => s"c_$l").mkString(" + ")
    s"""WITH f AS (SELECT doc_id, lang, $duckToks AS t FROM documents),
        s AS (SELECT doc_id, lang, $scores FROM f)
        SELECT doc_id, lang,
          CASE WHEN $total > 0 THEN $best ELSE 'und' END AS pred_lang
        FROM s ORDER BY doc_id"""
  }

  /** Language-ID confusion matrix — the evaluation surface over
    * [[langId]]: (actual, predicted, n) cells, the aggregation any
    * classifier in the pipeline gets judged by. One tiny groupBy over
    * the per-doc predictions; BOTH engines reuse their langId twin
    * verbatim (Spark calls [[langId]], the oracle CTEs [[langIdSql]]),
    * so the eval can never drift from the model it evaluates.
    * langId's inner doc_id sort is dead under the groupBy and
    * Catalyst's EliminateSorts removes it from the plan.
    */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame =
    langId(spark, dir)
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")

  val langIdConfusionSql: String =
    s"""WITH p AS ($langIdSql)
        SELECT lang, pred_lang, count(*) AS n
        FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang"""

  // -------------------------------------------------------------- tf-idf

  /** TF-IDF with top-3 terms per document: tf = term count / doc length,
    * idf = ln(N/df). Three aggregations (term counts, doc lengths ride on
    * the token array, document frequencies) + one broadcast of the
    * N-scalar; `ln` is bit-identical between the JVM and DuckDB's libm on
    * this platform (verified), and every other value is a single division
    * or product of exact integers.
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .where(size(col("t")) > 0)
    val tok = d.select(col("doc_id"), size(col("t")).as("n_tok"),
      explode(col("t")).as("word"))
    val perDoc = tok.groupBy("doc_id", "word")
      .agg(count(lit(1)).as("cnt"), max(col("n_tok")).as("n_tok"))
    val dfDocs = perDoc.groupBy("word").agg(count(lit(1)).as("df_docs"))
    val n = d.agg(count(lit(1)).as("n_docs"))
    // round(…, 10): the JVM's Math.log intrinsic is allowed 1 ulp of error
    // and disagrees with libm (= DuckDB) on some arguments — every other
    // value in the engine is bit-exact, this is the one transcendental.
    // Rounded BEFORE the window so rank assignment matches too.
    val tfidfCol = round(
      (col("cnt").cast("double") / col("n_tok").cast("double")) *
        log(col("n_docs").cast("double") / col("df_docs").cast("double")), 10)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("word").asc)
    perDoc
      .join(dfDocs, "word")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"), tfidfCol.as("tfidf"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("doc_id"), col("word"), col("tfidf"), col("rn"))
      .orderBy("doc_id", "rn")
  }

  val tfidfSql: String =
    s"""WITH d AS (SELECT doc_id, $duckToks AS t FROM documents),
        d2 AS (SELECT doc_id, t FROM d WHERE len(t) > 0),
        tok AS (SELECT doc_id, len(t) AS n_tok, unnest(t) AS word FROM d2),
        per_doc AS (SELECT doc_id, word, count(*) AS cnt, max(n_tok) AS n_tok
                    FROM tok GROUP BY doc_id, word),
        df_docs AS (SELECT word, count(*) AS df_docs FROM per_doc GROUP BY word),
        n AS (SELECT count(*) AS n_docs FROM d2),
        scored AS (
          SELECT doc_id, word,
            round((CAST(cnt AS DOUBLE) / CAST(n_tok AS DOUBLE))
              * ln(CAST(n_docs AS DOUBLE) / CAST(df_docs AS DOUBLE)), 10) AS tfidf
          FROM per_doc JOIN df_docs USING (word), n)
        SELECT doc_id, word, tfidf, rn FROM (
          SELECT doc_id, word, tfidf,
            CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, word) AS INT) AS rn
          FROM scored) t
        WHERE rn <= 3 ORDER BY doc_id, rn"""

  // ----------------------------------------------------------- bm25 search

  /** Okapi BM25 parameters (the standard k₁=1.2, b=0.75), query-doc
    * sampling modulus, and results per query.
    */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25QueryMod = 25
  val Bm25TopK = 5

  /** BATCH BM25 ranked retrieval — the text-side twin of `q_knn_join`:
    * many queries × corpus top-k through shared POSTINGS, not a
    * per-query scan. The query workload is derived from the corpus
    * itself (every h48-sampled ~1-in-[[Bm25QueryMod]] document asks
    * "find docs like my [[tfidf]] top-3 terms"), so it exists at every
    * scale without external fixtures. Score = Σ_t idf(t) ·
    * tf·(k₁+1)/(tf + k₁·(1−b+b·len/avglen)) with the BM25+ idf form
    * ln(1 + (N−df+0.5)/(df+0.5)) ≥ 0.
    *
    * Scale shape: candidates come from an equi-join of the tiny
    * (query, term, df) table (broadcast — ≤ 3 terms/query) against the
    * per-doc term-frequency table, so the cost is Σ_t df(t) — postings
    * of the query terms, never a corpus scan per query (tf-idf picks
    * rare terms, keeping postings short); the (N, Σlen) scalars ride as
    * one broadcast row; top-k is a per-query window over candidates
    * only. Parity: the one transcendental (ln) and the per-term product
    * are rounded to 10 decimals, per-(query, doc) totals sum in
    * decimal(28,12) (fold-order-proof), the final cast-to-double is
    * identical in both engines. Output: (query_id, doc_id, score, rank).
    */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .where(size(col("t")) > 0)
    val tok = d.select(col("doc_id"), size(col("t")).as("n_tok"),
      explode(col("t")).as("word"))
    val perDoc = tok.groupBy("doc_id", "word")
      .agg(count(lit(1)).as("cnt"), max(col("n_tok")).as("n_tok"))
    val dfDocs = perDoc.groupBy("word").agg(count(lit(1)).as("df_docs"))
    val scalars = d.agg(count(lit(1)).as("n_docs"),
      sum(size(col("t")).cast("long")).as("total_tok"))
    val qterms = tfidf(spark, dir)
      .where(Hashing.h48(concat(lit("bm25q-"), col("doc_id"))) % Bm25QueryMod === 0)
      .select(col("doc_id").as("query_id"), col("word"))
    val idf = round(log(lit(1.0) +
      ((col("n_docs") - col("df_docs")).cast("double") + 0.5) /
        (col("df_docs").cast("double") + 0.5)), 10)
    val avglen = col("total_tok").cast("double") / col("n_docs").cast("double")
    val tfpart = (col("cnt").cast("double") * (Bm25K1 + 1.0)) /
      (col("cnt").cast("double") +
        lit(Bm25K1) * (lit(1.0 - Bm25B) +
          lit(Bm25B) * (col("n_tok").cast("double") / avglen)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    perDoc
      .join(broadcast(qterms.join(dfDocs, "word")), "word")
      .crossJoin(broadcast(scalars))
      .select(col("query_id"), col("doc_id"),
        round(idf * tfpart, 10).cast("decimal(28,12)").as("s"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("s")).as("sl"))
      .select(col("query_id"), col("doc_id"), col("sl").cast("double").as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= Bm25TopK)
      .orderBy("query_id", "rank")
  }

  val bm25Sql: String =
    s"""WITH d AS (SELECT doc_id, $duckToks AS t FROM documents),
        d2 AS (SELECT doc_id, t FROM d WHERE len(t) > 0),
        tok AS (SELECT doc_id, len(t) AS n_tok, unnest(t) AS word FROM d2),
        per_doc AS (SELECT doc_id, word, count(*) AS cnt, max(n_tok) AS n_tok
                    FROM tok GROUP BY doc_id, word),
        df_docs AS (SELECT word, count(*) AS df_docs FROM per_doc GROUP BY word),
        scalars AS (SELECT count(*) AS n_docs,
            CAST(sum(len(t)) AS BIGINT) AS total_tok FROM d2),
        tfidf AS ($tfidfSql),
        qterms AS (SELECT doc_id AS query_id, word FROM tfidf
          WHERE ${Hashing.duckH48("concat('bm25q-', doc_id)")} % $Bm25QueryMod = 0),
        cand AS (SELECT q.query_id, p.doc_id,
            CAST(round(
              round(ln(1.0 + (CAST(s.n_docs - f.df_docs AS DOUBLE) + 0.5)
                / (CAST(f.df_docs AS DOUBLE) + 0.5)), 10)
              * ((CAST(p.cnt AS DOUBLE) * ${Bm25K1 + 1.0}) /
                 (CAST(p.cnt AS DOUBLE) + $Bm25K1 * ((1.0 - $Bm25B) + $Bm25B
                   * (CAST(p.n_tok AS DOUBLE)
                      / (CAST(s.total_tok AS DOUBLE)
                         / CAST(s.n_docs AS DOUBLE)))))), 10)
              AS DECIMAL(28,12)) AS s
          FROM per_doc p
            JOIN qterms q ON p.word = q.word
            JOIN df_docs f ON p.word = f.word, scalars s),
        scored AS (SELECT query_id, doc_id,
            CAST(sum(s) AS DOUBLE) AS score
          FROM cand GROUP BY query_id, doc_id)
        SELECT query_id, doc_id, score, rank FROM (
          SELECT query_id, doc_id, score,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS INT) AS rank
          FROM scored) r
        WHERE rank <= $Bm25TopK ORDER BY query_id, rank"""

  // ----------------------------------------------------- retrieval eval

  /** Graded-relevance retrieval evaluation — the quality loop run on a
    * retrieval index before it feeds a RAG/data-selection pipeline:
    * nDCG@[[Bm25TopK]] and reciprocal rank per query over the [[bm25]]
    * retriever. Relevance is a deterministic function of the corpus
    * (rel 2 = retrieved doc shares the query doc's source, rel 1 =
    * shares its lang, else 0 — the "same crawl / same language" proxy
    * labels an unlabeled corpus supports at any scale), so the eval
    * needs no external judgment fixture and both engines derive
    * identical labels.
    *
    * Exactness: gains are the small integers 2^rel−1 ∈ {0,1,3}; each
    * DCG term gain/log2(rank+1) is the one transcendental — rounded to
    * 10 decimals both sides, then decimal(28,12)-summed (fold-order
    * proof); ideal DCG re-ranks the SAME gains by (rel desc, rank asc)
    * in a per-query window over ≤ k rows (partition count scales with
    * queries); ndcg/rr are single double divisions of identically
    * rounded operands. Scale: everything downstream of [[bm25]] is
    * per-(query, hit) arithmetic over k·|queries| rows plus two
    * broadcast-sized metadata joins.
    * Output: (query_id, n_rel, rr, dcg, idcg, ndcg), sorted.
    */
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val meta = docs(spark, dir).select(col("doc_id"), col("source"), col("lang"))
    val hits = bm25(spark, dir).select("query_id", "doc_id", "rank")
      .join(broadcast(meta.select(col("doc_id").as("query_id"),
        col("source").as("q_source"), col("lang").as("q_lang"))), "query_id")
      .join(meta, "doc_id")
      .withColumn("rel",
        when(col("source") === col("q_source"), 2)
          .when(col("lang") === col("q_lang"), 1).otherwise(0))
      .withColumn("gain", (pow(lit(2.0), col("rel")) - 1.0).cast("long"))
    val ideal = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("rank").asc)
    val terms = hits
      .withColumn("irank", row_number().over(ideal))
      .select(col("query_id"), col("rel"), col("rank"),
        round(col("gain").cast("double") / log2(col("rank") + 1.0), 10)
          .cast("decimal(28,12)").as("dt"),
        round(col("gain").cast("double") / log2(col("irank") + 1.0), 10)
          .cast("decimal(28,12)").as("it"))
    terms.groupBy("query_id")
      .agg(sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_rel"),
        min(when(col("rel") > 0, col("rank"))).as("fr"),
        sum("dt").as("dcg_d"), sum("it").as("idcg_d"))
      .select(col("query_id"), col("n_rel"),
        when(col("fr").isNotNull, lit(1.0) / col("fr"))
          .otherwise(lit(0.0)).as("rr"),
        col("dcg_d").cast("double").as("dcg"),
        col("idcg_d").cast("double").as("idcg"),
        when(col("idcg_d") > 0,
          col("dcg_d").cast("double") / col("idcg_d").cast("double"))
          .otherwise(lit(0.0)).as("ndcg"))
      .orderBy("query_id")
  }

  val retrievalEvalSql: String =
    s"""WITH r AS ($bm25Sql),
        m AS (SELECT doc_id, source, lang FROM documents),
        h AS (SELECT r.query_id, r.doc_id, r.rank,
            CASE WHEN dm.source = qm.source THEN 2
                 WHEN dm.lang = qm.lang THEN 1 ELSE 0 END AS rel
          FROM r JOIN m qm ON r.query_id = qm.doc_id
          JOIN m dm ON r.doc_id = dm.doc_id),
        g AS (SELECT query_id, rel, rank,
            CAST(2 ** rel - 1 AS BIGINT) AS gain,
            row_number() OVER (PARTITION BY query_id
              ORDER BY rel DESC, rank ASC) AS irank
          FROM h),
        t AS (SELECT query_id, rel, rank,
            CAST(round(CAST(gain AS DOUBLE) / log2(rank + 1), 10)
              AS DECIMAL(28,12)) AS dt,
            CAST(round(CAST(gain AS DOUBLE) / log2(irank + 1), 10)
              AS DECIMAL(28,12)) AS it
          FROM g),
        a AS (SELECT query_id,
            CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
            min(CASE WHEN rel > 0 THEN rank END) AS fr,
            sum(dt) AS dcg_d, sum(it) AS idcg_d
          FROM t GROUP BY query_id)
        SELECT query_id, n_rel,
          CASE WHEN fr IS NOT NULL THEN CAST(1.0 AS DOUBLE) / fr
            ELSE CAST(0.0 AS DOUBLE) END AS rr,
          CAST(dcg_d AS DOUBLE) AS dcg,
          CAST(idcg_d AS DOUBLE) AS idcg,
          CASE WHEN idcg_d > 0 THEN CAST(dcg_d AS DOUBLE)
            / CAST(idcg_d AS DOUBLE) ELSE 0.0 END AS ndcg
        FROM a ORDER BY query_id"""

  // ------------------------------------------------------------ splitting

  /** THE canonical train/test assignment (salt, modulus, fraction) — the
    * single definition shared by [[trainTestSplit]], [[corpusClean]] and
    * the split-leakage check, so the split the leakage detector validates
    * can never drift from the split the pipeline produces.
    */
  private[graft] def splitExpr(idCol: Column): Column =
    when(Hashing.h48(concat(lit("split-"), idCol)) % 100 < 80, lit("train"))
      .otherwise(lit("test"))

  /** DuckDB twin of [[splitExpr]] over a SQL id expression. */
  private[graft] def duckSplitExpr(idExpr: String): String =
    s"""CASE WHEN ${Hashing.duckH48(s"concat('split-', $idExpr)")} % 100 < 80
        THEN 'train' ELSE 'test' END"""

  /** Deterministic train/test split by content-independent hash of the
    * document id (stable across runs, machines, and engines — the property
    * random() lacks): 80/20, reported per (lang, split).
    */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"), splitExpr(col("doc_id")).as("split"))
      .groupBy("lang", "split").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "split")

  val trainTestSplitSql: String =
    s"""SELECT lang, ${duckSplitExpr("doc_id")} AS split, count(*) AS n_docs
        FROM documents GROUP BY 1, 2 ORDER BY lang, split"""

  // ------------------------------------------------------------------ pmi

  val PmiMinDf = 25
  val PmiMinCo = 10
  val PmiTopK = 25

  /** Pointwise mutual information over in-document word co-occurrence:
    * PMI(w1,w2) = ln(c12·N / (c1·c2)) with document-level counts (per-doc
    * dedup first — the reference's df semantics). The quadratic-per-doc
    * pair join is preceded by a VOCABULARY FILTER (df ≥ [[PmiMinDf]]):
    * at corpus scale the frequent-word dictionary is small enough to
    * broadcast, and pruning BEFORE the self-join is what keeps the pair
    * explosion proportional to useful output rather than raw text. The
    * single `ln` is rounded to 10 decimals on both sides (the tfidf
    * precedent: JVM Math.log is 1 ulp off libm for some arguments).
    */
  def pmiPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val tok = d.select(col("doc_id"),
      explode(array_distinct(toks(col("text")))).as("w"))
    val dfc = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .where(col("c") >= PmiMinDf)
    val ft = tok.join(broadcast(dfc), "w")
    val n = d.agg(count(lit(1)).as("n_docs"))
    val a = ft.select(col("doc_id"), col("w").as("w1"), col("c").as("c1"))
    val b = ft.select(col("doc_id"), col("w").as("w2"), col("c").as("c2"))
    a.join(b, Seq("doc_id")).where(col("w1") < col("w2"))
      .groupBy("w1", "w2", "c1", "c2").agg(count(lit(1)).as("c12"))
      .where(col("c12") >= PmiMinCo)
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"),
        round(log((col("c12") * col("n_docs")).cast("double") /
          (col("c1") * col("c2")).cast("double")), 10).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(PmiTopK)
  }

  val pmiPairsSql: String =
    s"""WITH d AS (SELECT doc_id, $duckToks AS t FROM documents),
        tok AS (SELECT doc_id, unnest(list_distinct(t)) AS w FROM d),
        dfc AS (SELECT w, count(*) AS c FROM tok GROUP BY w
                HAVING count(*) >= $PmiMinDf),
        ft AS (SELECT tok.doc_id, tok.w, dfc.c FROM tok JOIN dfc USING (w)),
        n AS (SELECT count(*) AS n_docs FROM documents),
        p AS (SELECT a.w AS w1, b.w AS w2, a.c AS c1, b.c AS c2,
                count(*) AS c12
              FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.w < b.w
              GROUP BY 1, 2, 3, 4)
        SELECT w1, w2, c12,
          round(ln(CAST(c12 * n_docs AS DOUBLE)
            / CAST(c1 * c2 AS DOUBLE)), 10) AS pmi
        FROM p, n WHERE c12 >= $PmiMinCo
        ORDER BY pmi DESC, w1, w2 LIMIT $PmiTopK"""

  // --------------------------------------------------------- source stats

  /** Per-SOURCE curation dashboard: document count, distinct-content
    * count (1 − n_unique/n_docs = the source's exact-dup pollution rate)
    * and mean quality score — the monitoring query that answers "which
    * crawl is polluting the corpus" before any per-doc gate runs. The
    * mean follows the logProb parity convention: each per-doc quality is
    * rounded to 10 decimals then summed in decimal(28,12) (partial-agg
    * order cannot move the sum), one double division at the end. The
    * distinct rides in the same aggregate: the Expand rewrite it
    * triggers duplicates rows only ABOVE the per-doc quality projection,
    * and every duplicated accumulator here is trivial (decimal add /
    * hash insert) — unlike the sketch case in `approxStatsRaw`, where
    * un-fusing paid (SURVEY §9.17).
    */
  def sourceStats(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("source"), col("text"), toks(col("text")).as("t"))
      .where(size(col("t")) > 0)
      .select(col("source"), md5(col("text")).as("h"),
        round(qualityExpr, 10).cast("decimal(28,12)").as("q"))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("h")).as("n_unique"),
        (sum(col("q")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_quality"))
      .orderBy("source")
  }

  val sourceStatsSql: String =
    s"""WITH qs AS ($qualityScoreSql)
        SELECT d.source,
          count(*) AS n_docs,
          count(DISTINCT md5(d.text)) AS n_unique,
          CAST(sum(CAST(round(qs.quality, 10) AS DECIMAL(28,12))) AS DOUBLE)
            / CAST(count(*) AS DOUBLE) AS mean_quality
        FROM qs JOIN documents d ON qs.doc_id = d.doc_id
        GROUP BY d.source ORDER BY d.source"""

  /** The corpus DATA CARD: one row of the headline numbers a dataset
    * release documents (and a curation run eyeballs first) — volume
    * (docs, sources, langs, tokens), exact-dup pollution (distinct
    * digests vs docs), quality profile (scored docs, gate pass count,
    * mean composite — over scored docs, the quality model's domain), and
    * predicted-English share. Three independent one-row aggregates
    * (documents scan, quality pass, lang-ID pass) cross-joined as
    * broadcast scalars — each input is one narrow scan + partial
    * aggregate, nothing shuffles more than its 1-row result; means are
    * exact-integer or round-then-decimal-sum divisions (the
    * [[sourceStats]] convention), engine-exact.
    */
  def corpusCard(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .select(col("source"), col("lang"), md5(col("text")).as("h"),
        size(toks(col("text"))).cast("long").as("n_tok"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("source")).as("n_sources"),
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(col("h")).as("distinct_texts"),
        (count(lit(1)) - count_distinct(col("h"))).as("exact_dup_docs"),
        sum(col("n_tok")).as("total_tokens"))
      .withColumn("mean_doc_tokens",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
    val q = qualityScore(spark, dir)
      .agg(count(lit(1)).as("scored_docs"),
        sum(when(col("quality") >= QualityThreshold, 1L).otherwise(0L))
          .as("quality_pass"),
        (sum(round(col("quality"), 10).cast("decimal(28,12)")).cast("double")
          / count(lit(1)).cast("double")).as("mean_quality"))
    val l = langId(spark, dir)
      .agg(sum(when(col("pred_lang") === "en", 1L).otherwise(0L))
        .as("en_docs"))
    base.crossJoin(broadcast(q)).crossJoin(broadcast(l))
  }

  // lazy: interpolates QualityThreshold, declared further down the object
  lazy val corpusCardSql: String =
    s"""WITH b AS (SELECT count(*) AS n_docs,
          count(DISTINCT source) AS n_sources,
          count(DISTINCT lang) AS n_langs,
          count(DISTINCT md5(text)) AS distinct_texts,
          count(*) - count(DISTINCT md5(text)) AS exact_dup_docs,
          CAST(sum(len($duckToks)) AS BIGINT) AS total_tokens
        FROM documents),
        q AS (SELECT count(*) AS scored_docs,
          CAST(sum(CASE WHEN quality >= $QualityThreshold THEN 1 ELSE 0 END)
            AS BIGINT) AS quality_pass,
          CAST(sum(CAST(round(quality, 10) AS DECIMAL(28,12))) AS DOUBLE)
            / CAST(count(*) AS DOUBLE) AS mean_quality
        FROM ($qualityScoreSql)),
        l AS (SELECT CAST(sum(CASE WHEN pred_lang = 'en' THEN 1 ELSE 0 END)
            AS BIGINT) AS en_docs
          FROM ($langIdSql))
        SELECT n_docs, n_sources, n_langs, distinct_texts, exact_dup_docs,
          total_tokens,
          CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
            AS mean_doc_tokens,
          scored_docs, quality_pass, mean_quality, en_docs
        FROM b, q, l"""

  // ------------------------------------------------------------ coverage

  val CoverageTopK = 100

  /** Cumulative VOCABULARY COVERAGE curve: what fraction of all token
    * occurrences the top-k most frequent words cover, for k = 1..100 —
    * the diminishing-returns curve behind vocabulary-size and stopword
    * decisions. Plan: one term-frequency aggregate (partial map-side, one
    * exchange on the word), `TakeOrdered` for the top 100, then the
    * running sum windows over just those 100 rows (single tiny
    * partition by construction — the full-vocab window never happens).
    * The corpus total rides along as a one-row broadcast scalar (the
    * tfidf/pmi pattern). Output: (rank, word, cnt, coverage).
    */
  def tokenCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs(spark, dir)
      .select(explode(toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val total = tf.agg(sum("cnt").as("total"))
    val top = tf.orderBy(col("cnt").desc, col("w")).limit(CoverageTopK)
    // input is Limit-bounded (≤ CoverageTopK rows), so one window group is
    // the design; partition by the scalar total column (constant-valued,
    // non-foldable) to say so explicitly — same single group, and no
    // partition-less WindowExec anywhere in a declared plan
    val ord = Window.partitionBy(col("total"))
      .orderBy(col("cnt").desc, col("w"))
    top.crossJoin(broadcast(total))
      .select(
        row_number().over(ord).as("rank"),
        col("w").as("word"), col("cnt"),
        (sum("cnt").over(ord.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double") / col("total").cast("double")).as("coverage"))
      .orderBy("rank")
  }

  val tokenCoverageSql: String =
    s"""WITH tok AS (SELECT unnest($duckToks) AS w FROM documents),
        tf AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
        tot AS (SELECT sum(cnt) AS total FROM tf),
        top AS (SELECT w, cnt FROM tf ORDER BY cnt DESC, w
                LIMIT $CoverageTopK)
        SELECT row_number() OVER (ORDER BY cnt DESC, w) AS rank,
          w AS word, cnt,
          CAST(sum(cnt) OVER (ORDER BY cnt DESC, w
              ROWS UNBOUNDED PRECEDING) AS DOUBLE)
            / CAST(total AS DOUBLE) AS coverage
        FROM top, tot ORDER BY rank"""

  // ------------------------------------------------------------- curation

  val QualityThreshold = 0.35

  /** End-to-end corpus curation — the flagship training-data composition,
    * one DAG: quality gate → language gate → exact dedup → near-dup
    * canonical selection → deterministic train/test split. The quality
    * and language scores come from a single FUSED scan (the standalone
    * queries each scan `documents`; at 100 TB fusing halves the dominant
    * cost — the oracle composes the unfused twins, same semantics).
    * Near-dup policy: a survivor is kept iff it is in no Jaccard cluster
    * or is its cluster's canonical (minimum id). Output is the compact
    * membership-pinning form (split, n_docs, id_sum).
    */
  def corpusClean(spark: SparkSession, dir: String): DataFrame = {
    val surv = docs(spark, dir)
      .select(col("doc_id"), col("text"), toks(col("text")).as("t"))
      .where(size(col("t")) > 0)
      .select(col("doc_id"), col("text"),
        qualityExpr.as("quality"), predLangExpr.as("pred_lang"))
      .where(col("quality") >= QualityThreshold && col("pred_lang") === "en")
    val exactKept = surv
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val clus = graft.dedup.Dedup.nearDupClusters(spark, dir)
      .select(col("doc_id"), col("canonical_id"))
    val kept = exactKept.join(clus, Seq("doc_id"), "left")
      .where(col("canonical_id").isNull || col("canonical_id") === col("doc_id"))
    kept
      .select(col("doc_id"), splitExpr(col("doc_id")).as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
      .orderBy("split")
  }

  val corpusCleanSql: String =
    s"""WITH q AS ($qualityScoreSql),
        l AS ($langIdSql),
        surv AS (SELECT d.doc_id, d.text FROM documents d
          JOIN q ON d.doc_id = q.doc_id
          JOIN l ON d.doc_id = l.doc_id
          WHERE q.quality >= $QualityThreshold AND l.pred_lang = 'en'),
        ek AS (SELECT min(doc_id) AS doc_id FROM surv GROUP BY md5(text)),
        clus AS (${graft.dedup.Dedup.nearDupClustersSql}),
        kept AS (SELECT ek.doc_id FROM ek
          LEFT JOIN clus ON ek.doc_id = clus.doc_id
          WHERE clus.doc_id IS NULL OR clus.canonical_id = ek.doc_id)
        SELECT ${duckSplitExpr("doc_id")} AS split,
          count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM kept GROUP BY 1 ORDER BY split"""

  // ---------------------------------------------------------- fingerprint

  /** Content fingerprints: order-sensitive polynomial rolling hash over the
    * token sequence (mod P) + the document's minimum shingle-hash (a
    * 1-permutation MinHash). Integer arithmetic end-to-end — engine-exact.
    * The groupBy-free plan: both fingerprints fold inside the row.
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    val t = col("t")
    val poly = aggregate(
      transform(t, w => Hashing.h48p(w)),
      lit(0L),
      (acc, x) => (acc * 31 + x) % P)
    val sh3 = transform(sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i),
        element_at(t, i + 1), element_at(t, i + 2)))
    val minShingle = array_min(transform(sh3, s => Hashing.h48p(s)))
    docs(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .where(size(t) >= 3)
      .select(col("doc_id"), poly.as("poly_fp"), minShingle.as("min_shingle_hash"))
      .orderBy("doc_id")
  }

  val fingerprintsSql: String =
    s"""WITH f AS (SELECT doc_id, $duckToks AS t FROM documents)
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(t, w -> ${duckH48p("w")})),
            (acc, x) -> (acc * 31 + x) % $P) AS poly_fp,
          list_min(list_transform(
            list_transform(range(1, len(t)-1),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
            s -> ${duckH48p("s")})) AS min_shingle_hash
        FROM f WHERE len(t) >= 3 ORDER BY doc_id"""

  // ----------------------------------------------------- feature hashing

  /** Hashing-trick vector width. Small so the fixtures exercise heavy
    * bucket collision; real runs use 2^18+.
    */
  val HashVecDim = 32

  /** Feature-hashing (hashing-trick) text vectorizer — the classic
    * no-vocabulary bag-of-words embedding (Weinberger et al. 2009;
    * scikit-learn's HashingVectorizer): token w lands in dimension
    * h48(w) mod [[HashVecDim]], value = term frequency. The bridge from
    * the documents table to a fixed-width vector column — exactly what
    * feeds a linear probe / clustering / dedup baseline when training a
    * real tokenizer+embedding is too expensive for a first pass.
    *
    * Scale: a PURE PROJECTION — hashes computed once per token in-row,
    * counts by in-row filter over the hashed array. No explode, no
    * shuffle, no vocabulary state; at 100 TB this runs at scan speed and
    * partitions trivially. All-integer output ⇒ engine-exact.
    * Output: (doc_id, n_tok, vec = comma-joined counts, one per dimension)
    * — the vector is declared as a joined string because the driver's
    * oracle comparator sorts/hashes scalar cells; the downstream typed
    * surface keeps the Array[Long] shape (see `hashVectorsTyped`).
    */
  def hashVectors(spark: SparkSession, dir: String): DataFrame =
    hashVectorsTyped(spark, dir)
      .select(col("doc_id"), col("n_tok"),
        concat_ws(",", transform(col("vec"), _.cast("string"))).as("vec"))
      .orderBy("doc_id")

  /** Typed twin of [[hashVectors]] keeping `vec` as Array[Long]. */
  def hashVectorsTyped(spark: SparkSession, dir: String): DataFrame = {
    val dims = transform(toks(col("text")),
      w => graft.functions.Hashing.h48(w) % HashVecDim)
    docs(spark, dir)
      .select(col("doc_id"), dims.as("dims"))
      .select(col("doc_id"), size(col("dims")).cast("long").as("n_tok"),
        transform(sequence(lit(0), lit(HashVecDim - 1)),
          i => size(filter(col("dims"), d => d === i.cast("long")))
            .cast("long")).as("vec"))
  }

  val hashVectorsSql: String =
    s"""WITH t AS (SELECT doc_id,
          list_transform($duckToks, w -> ${Hashing.duckH48("w")} % $HashVecDim)
            AS dims
        FROM documents)
        SELECT doc_id, CAST(len(dims) AS BIGINT) AS n_tok,
          array_to_string(list_transform(range(0, $HashVecDim),
            i -> CAST(len(list_filter(dims, d -> d = i)) AS BIGINT)), ',')
            AS vec
        FROM t ORDER BY doc_id"""

  // -------------------------------------------------------- heavy hitters

  val MgK = 8
  val HeavyTopN = 10

  /** Heavy hitters over the token stream via the mergeable Misra–Gries
    * sketch ([[graft.functions.MisraGries]]) — the fixed-memory scale twin
    * of the exact token count: k counters per partial aggregate regardless
    * of vocabulary size, while exact `groupBy(word)` state grows with
    * distinct words. The declared output follows the `q_approx_stats`
    * sketch contract: engine-exact columns (the top-[[HeavyTopN]] words by
    * exact count) plus the MG guarantee as booleans the oracle asserts
    * TRUE —
    *   present_ok: in-sketch, or exact ≤ (N−M)/(k+1) (absent ⇒ est 0 and
    *     the bound caps the true count);
    *   est_ok: absent, or est ≤ exact ≤ est + (N−M)/(k+1)
    * with N = stream length, M = retained sketch mass — the Agarwal et
    * al. 2012 merged-summary bound, so the booleans are theorems about
    * ANY merge tree Spark happens to schedule, not this run's luck.
    * Raw sketch estimates additionally bounded in MisraGriesSpec.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mg = new graft.functions.MisraGries.MisraGriesAggregator(MgK)
    val t = docs(spark, dir).select(explode(toks(col("text"))).as("w"))
    val sketch = t.as[String].select(mg.toColumn).toDF()
      .select(explode(arrays_zip(col("words").as("word"),
        col("counts").as("est"))).as("s"))
      .select(col("s.word").as("word"), col("s.est").as("est"))
    val mass = sketch.agg(sum("est").as("m"))
    val exact = t.groupBy(col("w").as("word")).agg(count(lit(1)).as("exact_c"))
    val total = exact.agg(sum("exact_c").as("n"))
    val top = exact.orderBy(col("exact_c").desc, col("word")).limit(HeavyTopN)
    val bound = (col("n") - col("m")) / lit(MgK + 1L) // integer div below
    top.join(sketch, Seq("word"), "left")
      .crossJoin(broadcast(total)).crossJoin(broadcast(mass))
      .select(col("word"), col("exact_c"),
        (col("est").isNotNull ||
          col("exact_c") <= floor(bound).cast("long")).as("present_ok"),
        (col("est").isNull ||
          (col("est") <= col("exact_c") &&
            col("exact_c") - col("est") <= floor(bound).cast("long")))
          .as("est_ok"))
      .orderBy(col("exact_c").desc, col("word"))
  }

  val heavyHittersSql: String =
    s"""WITH tok AS (SELECT unnest($duckToks) AS w FROM documents),
        ex AS (SELECT w AS word, count(*) AS exact_c FROM tok GROUP BY w)
        SELECT word, exact_c, TRUE AS present_ok, TRUE AS est_ok
        FROM ex ORDER BY exact_c DESC, word LIMIT $HeavyTopN"""

  /** ±bound for [[sketchShards]]' HLL estimates: DataSketches HLL at the
    * default lgK=12 has RSE ≈ 1.04/√4096 ≈ 1.6%; 5% is ≈3σ, plus a
    * small-count floor.
    */
  val SketchRelErr = 0.05

  /** MERGEABLE per-shard sketch statistics — the incremental form of a
    * corpus-wide distinct count: each source (shard) builds a DataSketches
    * HLL sketch of its token vocabulary ONCE; corpus-wide vocabulary then
    * comes from `hll_union_agg` over the stored sketch bytes — merge,
    * never rescan (the monoid the `q_dedup_incremental` index applies to
    * membership, applied to cardinality). The declared output carries the
    * exact per-source distinct counts (hash-checkable) plus `est_ok`
    * booleans asserting every sketch estimate — per shard AND the unioned
    * "(ALL)" row — lands within [[SketchRelErr]] of exact (the
    * `q_approx_stats` error-bound contract: DuckDB cannot reproduce
    * sketch bytes, but it can verify the claim). The union row is the
    * point: its estimate is computed FROM THE PER-SOURCE SKETCHES, so a
    * new shard updates corpus stats by one sketch build + a 4 KB-per-row
    * merge. `SketchSpec` proves the bytes survive a parquet round trip
    * and merge to the same estimate.
    * Output: (source, n_exact, est_ok); "(ALL)" sorts first.
    */
  def sketchShards(spark: SparkSession, dir: String): DataFrame = {
    val t = docs(spark, dir)
      .select(col("source"), explode(toks(col("text"))).as("w"))
    val per = t.groupBy("source").agg(
      hll_sketch_agg(col("w")).as("sk"),
      countDistinct(col("w")).as("n_exact"))
    def ok(est: Column, exact: Column): Column =
      abs(est.cast("double") - exact.cast("double")) <=
        greatest(lit(10.0), lit(SketchRelErr) * exact.cast("double"))
    val globalExact = t.agg(countDistinct(col("w")).as("n_exact"))
    val merged = per.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val all = globalExact.crossJoin(broadcast(merged))
      .select(lit("(ALL)").as("source"), col("n_exact"),
        ok(col("est"), col("n_exact")).as("est_ok"))
    per.select(col("source"), col("n_exact"),
        ok(hll_sketch_estimate(col("sk")), col("n_exact")).as("est_ok"))
      .unionByName(all)
      .orderBy("source")
  }

  val sketchShardsSql: String =
    s"""WITH tok AS (SELECT source, unnest($duckToks) AS w FROM documents),
        per AS (SELECT source, count(DISTINCT w) AS n_exact
                FROM tok GROUP BY source),
        g AS (SELECT '(ALL)' AS source, count(DISTINCT w) AS n_exact
              FROM tok)
        SELECT source, n_exact, TRUE AS est_ok FROM per
        UNION ALL SELECT source, n_exact, TRUE AS est_ok FROM g
        ORDER BY source"""

  /** Value-block count for the distributed exact-rank decomposition
    * ([[rankBlock]]): per-(source, block) partitions replace whole-source
    * window partitions, so ranking parallelism scales with data instead
    * of |sources|.
    */
  val RankBlocks = 64

  /** Monotone value→block maps for the decomposition. Correctness needs
    * exactly two properties: equal values share a block, larger values
    * never land in a smaller block — then rows in lower blocks are
    * strictly smaller, ties never straddle an edge, and
    * offset + within-block rank EQUALS the whole-partition window rank
    * row for row. ANY monotone map qualifies (skew only unbalances block
    * sizes, never changes a rank), so both maps are FIXED grids needing
    * no data pass: quality is bounded in [0, 1] by construction
    * (0.4·ratio + 0.4·ratio + 0.2·capped), log-prob is clamped onto
    * [−16·[[RankBlocks]], 0] in 16-unit buckets (a 100-token doc at the
    * corpus's ~−7/token sits mid-grid; outliers clamp into the end
    * blocks, which costs balance, not correctness). A data-dependent
    * min/max grid would balance better but costs a FULL extra scoring
    * pass per query — measured 2–4× the whole query (round 8).
    */
  private[graft] def qualityBlock(q: Column): Column =
    least(lit(RankBlocks - 1), floor(q * RankBlocks)).cast("int")
  private[graft] def logprobBlock(lp: Column): Column =
    least(lit(RankBlocks - 1),
      greatest(lit(0), lit(RankBlocks) + floor(lp / 16))).cast("int")

  /** Per-source quality calibration — map each doc's raw quality score to
    * its PERCENTILE WITHIN ITS SOURCE (ppm): raw scores are not
    * comparable across sources (each crawl has its own length/stopword
    * distribution, so a global threshold over-filters one source and
    * under-filters another); rank-normalizing per source is the standard
    * fix before a corpus-wide gate. pr_ppm = (rank−1)·10⁶ div (n−1)
    * (dense ties broken by doc_id ⇒ deterministic; single-doc sources
    * pin to 0) — all-integer, engine-exact.
    *
    * Scale shape (the round-7 fix): the per-source rank decomposes over
    * [[qualityBlock]]'s fixed value grid — whole-source window
    * partitions would cap parallelism at |sources| ≪ cores at 100 TB.
    * EXACTLY TWO heavy passes, no matter what: pass 1 aggregates
    * per-(source, block) counts (tiny output: ≤ [[RankBlocks]]
    * rows/source), from which ONE frame of windows-over-the-tiny-table
    * derives both each block's rank offset (range-frame running sum)
    * and the source total n; pass 2 joins that frame back and takes the
    * within-block row_number in a window whose partition count scales
    * with data. rank = offset + within-block rank — identical to the
    * one-window form row for row (ties share a block; lower blocks are
    * strictly smaller). Output: (doc_id, source, quality, pr_ppm).
    */
  def qualityCalibrated(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = docs(spark, dir).select(col("doc_id"), col("source"))
    val b = qualityScore(spark, dir).select(col("doc_id"), col("quality"))
      .join(src, "doc_id")
      .withColumn("blk", qualityBlock(col("quality")))
    val prevBlocks = Window.partitionBy("source").orderBy("blk")
      .rangeBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy("source", "blk").agg(count(lit(1)).as("c"))
      .select(col("source"), col("blk"),
        coalesce(sum("c").over(prevBlocks), lit(0L)).as("off"),
        sum("c").over(Window.partitionBy("source")).as("n"))
    val within = Window.partitionBy("source", "blk")
      .orderBy("quality", "doc_id")
    b.join(offsets, Seq("source", "blk"))
      .withColumn("rk", col("off") + row_number().over(within))
      .select(col("doc_id"), col("source"), col("quality"),
        when(col("n") > 1, expr("(rk - 1) * 1000000 div (n - 1)"))
          .otherwise(lit(0L)).as("pr_ppm"))
      .orderBy("doc_id")
  }

  val qualityCalibratedSql: String =
    s"""WITH q AS ($qualityScoreSql),
        j AS (SELECT q.doc_id, d.source, q.quality,
            row_number() OVER (PARTITION BY d.source
              ORDER BY q.quality, q.doc_id) AS rk,
            count(*) OVER (PARTITION BY d.source) AS n
          FROM q JOIN documents d ON q.doc_id = d.doc_id)
        SELECT doc_id, source, quality,
          CAST(CASE WHEN n > 1 THEN (rk - 1) * 1000000 // (n - 1)
               ELSE 0 END AS BIGINT) AS pr_ppm
        FROM j ORDER BY doc_id"""

  // ------------------------------------------------------ lexical diversity

  /** Per-source lexical-diversity audit — type-token ratio over words and
    * over word trigrams, the curation dashboard numbers that catch
    * template/boilerplate-heavy sources (low trigram diversity at normal
    * word diversity is the signature of mad-libs spam) before they flood
    * a training mix. All-integer outputs (counts + ppm ratios via integer
    * division) ⇒ engine-exact.
    *
    * Scale: one explode per granularity into a (source, gram) partial
    * agg — the distinct counts are two-level hash aggregations (Catalyst
    * plans count(DISTINCT) as a (source, gram) pre-aggregation, so the
    * exchange carries unique grams, not token instances). No driver
    * state; at 100 TB swap countDistinct for approx_count_distinct and
    * the plan shape is unchanged (the `q_approx_stats` sketch contract).
    * Output: (source, n_docs, n_tokens, n_types, ttr_ppm, n_trigrams,
    * n_tri_types, tri_ttr_ppm).
    */
  def diversity(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("source"), toks(col("text")).as("t"))
    val words = d.select(col("source"), explode(col("t")).as("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), countDistinct("w").as("n_types"))
    val triArr = when(size(col("t")) >= 3,
      transform(sequence(lit(1), size(col("t")) - 2), i =>
        concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1),
          element_at(col("t"), i + 2))))
      .otherwise(array().cast("array<string>"))
    val tris = d.select(col("source"), explode(triArr).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_trigrams"), countDistinct("g").as("n_tri_types"))
    val nDocs = docs(spark, dir).groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
    nDocs
      .join(words, Seq("source"), "left")
      .join(tris, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          expr("n_types * 1000000 div n_tokens")).as("ttr_ppm"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_tri_types"), lit(0L)).as("n_tri_types"),
        when(coalesce(col("n_trigrams"), lit(0L)) > 0,
          expr("n_tri_types * 1000000 div n_trigrams")).as("tri_ttr_ppm"))
      .orderBy("source")
  }

  val diversitySql: String =
    s"""WITH d AS (SELECT source, $duckToks AS t FROM documents),
        w AS (SELECT source, unnest(t) AS w FROM d),
        ws AS (SELECT source, count(*) AS n_tokens,
                 count(DISTINCT w) AS n_types FROM w GROUP BY source),
        g AS (SELECT source, unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
              FROM d WHERE len(t) >= 3),
        gs AS (SELECT source, count(*) AS n_trigrams,
                 count(DISTINCT g) AS n_tri_types FROM g GROUP BY source),
        nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
        SELECT nd.source, nd.n_docs,
          coalesce(ws.n_tokens, 0) AS n_tokens,
          coalesce(ws.n_types, 0) AS n_types,
          CASE WHEN coalesce(ws.n_tokens, 0) > 0
            THEN ws.n_types * 1000000 // ws.n_tokens END AS ttr_ppm,
          coalesce(gs.n_trigrams, 0) AS n_trigrams,
          coalesce(gs.n_tri_types, 0) AS n_tri_types,
          CASE WHEN coalesce(gs.n_trigrams, 0) > 0
            THEN gs.n_tri_types * 1000000 // gs.n_trigrams END AS tri_ttr_ppm
        FROM nd LEFT JOIN ws ON nd.source = ws.source
        LEFT JOIN gs ON nd.source = gs.source
        ORDER BY nd.source"""

  // --------------------------------------------- HTML content extraction

  /** Deterministic markup fixture wrapped around `documents.text` (the
    * FIXTURES.md pattern — the corpus is plain prose, so the crawl-page
    * shape is synthesized IN-PLAN, identically in both engines): head
    * with title/style/script, a nav link bar, a link-list sidebar, the
    * prose as `<p>` blocks inside `<article>` (newlines become paragraph
    * breaks), and a link-heavy footer. Every chrome element is the kind a
    * real page has and a main-content extractor must drop.
    */
  private def htmlExpr: Column = {
    val sec = (col("doc_id") % 7).cast("string")
    concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><style>body{margin:0}</style><script>var v="), sec,
      lit(";</script></head><body><nav><a href=\"/\">Home</a> | <a href=\"/c"),
      sec,
      lit("\">Section</a> | <a href=\"/about\">About</a></nav>" +
        "<div class=\"side\"><ul>" +
        "<li><a href=\"/r1\">Related article one</a></li>" +
        "<li><a href=\"/r2\">Related article two</a></li></ul></div>" +
        "<article><p>"),
      regexp_replace(coalesce(col("text"), lit("")), "\n", "</p><p>"),
      lit("</p></article><footer>© <a href=\"/privacy\">Privacy policy</a>" +
        " · <a href=\"/terms\">Terms of use</a></footer></body></html>"))
  }

  private val duckHtml: String =
    """'<html><head><title>Doc ' || doc_id ||
       '</title><style>body{margin:0}</style><script>var v=' ||
       (doc_id % 7) ||
       ';</script></head><body><nav><a href="/">Home</a> | <a href="/c' ||
       (doc_id % 7) ||
       '">Section</a> | <a href="/about">About</a></nav><div class="side"><ul><li><a href="/r1">Related article one</a></li><li><a href="/r2">Related article two</a></li></ul></div><article><p>' ||
       regexp_replace(coalesce(text, ''), '\n', '</p><p>', 'g') ||
       '</p></article><footer>© <a href="/privacy">Privacy policy</a> · <a href="/terms">Terms of use</a></footer></body></html>'"""

  /** Closing tags that delimit text BLOCKS for the density filter; one
    * regex shared verbatim by both engines (RE2/Java-common subset).
    */
  val BlockSplitRegex = "</(?:p|li|ul|div|nav|footer|article|body|html)>"

  /** HTML main-content extraction — the curation stage BEFORE quality
    * filtering (the trafilatura/CCNet step): strip the page chrome, keep
    * the prose. Algorithm, per document: (1) drop the `<head>` wholesale
    * (title/style/script are never content); (2) split the remainder
    * into blocks at closing block-tags ([[BlockSplitRegex]]); (3) per
    * block, tag-strip + whitespace-collapse to its text, and measure its
    * LINK DENSITY (chars inside `<a>` anchors vs text chars); (4) keep
    * non-empty blocks whose anchor text is under half their text — the
    * boilerplate-removal heuristic: nav bars, link-list sidebars and
    * link-heavy footers are mostly anchor text, prose is not. The kept
    * blocks joined by single spaces are the extracted main content.
    *
    * Declared output pins the extraction without shipping it: per doc,
    * the raw page size, kept-block count, extracted length, and the md5
    * of the extracted text (an exact content checksum both engines
    * compute from their own extraction — one flipped block anywhere
    * breaks the hash). Pure per-row projection: no shuffle, no UDF —
    * split/transform/filter/aggregate higher-order functions end to end;
    * at 100 TB this is one embarrassingly parallel scan exactly like
    * [[qualityScore]]. Output: (doc_id, html_chars, n_blocks,
    * main_chars, main_digest).
    */
  def textExtract(spark: SparkSession, dir: String): DataFrame = {
    val segTxt = (s: Column) =>
      trim(regexp_replace(regexp_replace(s, "<[^>]*>", " "), "\\s+", " "))
    val anchorLen = (s: Column) =>
      aggregate(regexp_extract_all(s, lit("<a[^>]*>([^<]*)</a>"), lit(1)),
        lit(0), (acc, x) => acc + length(x))
    docs(spark, dir)
      .select(col("doc_id"), htmlExpr.as("html"))
      .withColumn("segs", transform(
        split(regexp_replace(col("html"), "<head>[\\s\\S]*?</head>", ""),
          BlockSplitRegex),
        s => struct(segTxt(s).as("txt"), anchorLen(s).as("alen"))))
      .withColumn("kept", filter(col("segs"),
        b => length(b.getField("txt")) > 0 &&
          b.getField("alen") * 2 < length(b.getField("txt"))))
      .withColumn("main",
        concat_ws(" ", transform(col("kept"), b => b.getField("txt"))))
      .select(col("doc_id"), length(col("html")).as("html_chars"),
        size(col("kept")).as("n_blocks"),
        length(col("main")).as("main_chars"),
        md5(col("main")).as("main_digest"))
      .orderBy("doc_id")
  }

  val textExtractSql: String =
    s"""WITH h AS (SELECT doc_id, $duckHtml AS html FROM documents),
        b AS (SELECT doc_id, html,
            list_transform(
              string_split_regex(
                regexp_replace(html, '<head>.*?</head>', '', 's'),
                '$BlockSplitRegex'),
              s -> struct_pack(
                txt := trim(regexp_replace(regexp_replace(
                  s, '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')),
                alen := list_reduce(list_prepend(0, list_transform(
                  regexp_extract_all(s, '<a[^>]*>([^<]*)</a>', 1),
                  x -> len(x))), (a, x) -> a + x))) AS segs
          FROM h),
        k AS (SELECT doc_id, html,
            list_filter(segs, s -> len(s.txt) > 0 AND 2 * s.alen < len(s.txt))
              AS kept
          FROM b),
        m AS (SELECT doc_id, html, kept,
            array_to_string(list_transform(kept, s -> s.txt), ' ') AS main
          FROM k)
        SELECT doc_id, CAST(len(html) AS INT) AS html_chars,
          CAST(len(kept) AS INT) AS n_blocks,
          CAST(len(main) AS INT) AS main_chars,
          md5(main) AS main_digest
        FROM m ORDER BY doc_id"""

  // ------------------------------------------------------------ score AUC

  /** Classifier-score AUC — the ROC area of the quality score at
    * separating English documents from the rest (the GPT-3 / CCNet
    * quality-filter eval shape: the heuristic's stopword list is
    * English, so `lang = 'en'` is the positive class its score should
    * rank above everything else; AUC is THE threshold-free answer to
    * "is this filter worth deploying"). EXACT, ties handled by the
    * Mann–Whitney midrank convention: AUC·n₊·n₋ = #{pairs s₊ > s₋} +
    * ½·#{ties}, computed as U2 = Σ_s c₊(s)·(2·neg_below(s) + c₋(s))
    * over the distinct-score table, auc_ppm = U2·10⁶ div (2·n₊·n₋).
    *
    * Scale shape: scores quantize to integer ppm (same double arithmetic
    * both engines ⇒ floor is engine-exact), so the distinct-score table
    * is BOUNDED at 10⁶+1 rows at any corpus size — but even that never
    * meets a partition-less window: `neg_below` decomposes over the
    * fixed [[RankBlocks]] value grid exactly like [[qualityCalibrated]]
    * (within-block running sums in blk-partitioned windows + a
    * triangular join over the ≤[[RankBlocks]]-row per-block totals for
    * the cross-block mass). One corpus scan, one bounded aggregate,
    * then broadcast-sized arithmetic; U2 runs widened to decimal(38,0)
    * (HUGEINT in the oracle) so 2^40-row classes cannot overflow.
    * Output: one row (n_pos, n_neg, auc_ppm).
    */
  def scoreAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lab = docs(spark, dir)
      .select(col("doc_id"), (col("lang") === "en").as("pos"))
    val scored = qualityScore(spark, dir)
      .select(col("doc_id"),
        floor(col("quality") * 1000000).cast("long").as("s"))
      .join(lab, "doc_id")
    val blkWidth = 1000000 / RankBlocks + 1
    val g = scored
      .withColumn("blk",
        least(lit(RankBlocks - 1), expr(s"s div $blkWidth")).cast("int"))
      .groupBy("blk", "s")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cn"))
    val within = Window.partitionBy("blk").orderBy("s")
      .rangeBetween(Window.unboundedPreceding, -1)
    val w = g.withColumn("nb_in", coalesce(sum("cn").over(within), lit(0L)))
    val blkTot = g.groupBy("blk").agg(sum("cn").as("bn"))
    val lower = blkTot.as("a")
      .join(broadcast(blkTot.as("b")), col("a.blk") > col("b.blk"), "left")
      .groupBy(col("a.blk").as("blk"))
      .agg(coalesce(sum(col("b.bn")), lit(0L)).as("nb_lower"))
    w.join(broadcast(lower), "blk")
      .withColumn("nb", col("nb_in") + col("nb_lower"))
      .agg(sum("cp").as("n_pos"), sum("cn").as("n_neg"),
        sum(expr("cast(cp as decimal(38,0)) * (2 * nb + cn)")).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        // guard the one-class corpus (n_pos or n_neg = 0): AUC is
        // undefined, and an unguarded division diverges BETWEEN engines
        // (Spark `div` yields NULL, DuckDB `//` raises) — the CASE
        // makes both return NULL, mirroring eventsForecast's d_train
        // guard
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("""cast(u2 * 1000000
                       div (2 * cast(n_pos as decimal(38,0)) * n_neg)
                  as bigint)"""))
          .otherwise(lit(null).cast("long")).as("auc_ppm"))
  }

  val scoreAucSql: String =
    s"""WITH q AS ($qualityScoreSql),
        sc AS (SELECT CAST(floor(q.quality * 1000000) AS BIGINT) AS s,
                 (d.lang = 'en') AS pos
               FROM q JOIN documents d ON q.doc_id = d.doc_id),
        g AS (SELECT s,
                CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cp,
                CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cn
              FROM sc GROUP BY s),
        w AS (SELECT s, cp, cn,
                CAST(coalesce(sum(cn) OVER (ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS HUGEINT) AS nb
              FROM g),
        t AS (SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
                CAST(sum(cn) AS BIGINT) AS n_neg,
                sum(CAST(cp AS HUGEINT) * (2 * nb + cn)) AS u2
              FROM w)
        SELECT n_pos, n_neg,
          CASE WHEN n_pos > 0 AND n_neg > 0 THEN
            CAST(u2 * 1000000 // (2 * CAST(n_pos AS HUGEINT) * n_neg)
              AS BIGINT)
          END AS auc_ppm
        FROM t"""

  // ---------------------------------------------------- global percentile

  /** Corpus-GLOBAL quality percentile per document — the companion to
    * [[qualityCalibrated]] (which ranks within each source): a single
    * corpus-wide gate ("drop the bottom 20% of the whole corpus") needs
    * every doc's rank against ALL docs, not its source cohort.
    * pr_ppm = (rank−1)·10⁶ div (n−1), ties broken by doc_id — the same
    * all-integer contract as the per-source form.
    *
    * Scale shape: a global rank is the textbook partition-less window —
    * banned here. Instead the [[qualityBlock]] fixed-grid decomposition
    * runs WITHOUT the source key: per-block counts (≤[[RankBlocks]]
    * rows total) feed a triangular block join for each block's global
    * offset, the corpus total rides along as a broadcast one-row frame,
    * and the within-block row_number runs in blk-partitioned windows
    * whose partition count scales with data. rank = offset +
    * within-block rank, row-for-row identical to the one-window form.
    * Output: (doc_id, quality, pr_ppm) ordered by doc_id.
    */
  def qualityGlobal(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = qualityScore(spark, dir).select(col("doc_id"), col("quality"))
      .withColumn("blk", qualityBlock(col("quality")))
    val blkTot = b.groupBy("blk").agg(count(lit(1)).as("c"))
    val offsets = blkTot.as("a")
      .join(broadcast(blkTot.as("b")), col("a.blk") > col("b.blk"), "left")
      .groupBy(col("a.blk").as("blk"))
      .agg(coalesce(sum(col("b.c")), lit(0L)).as("off"))
    val n = blkTot.agg(sum("c").as("n"))
    val within = Window.partitionBy("blk").orderBy("quality", "doc_id")
    b.join(broadcast(offsets), "blk")
      .withColumn("rk", col("off") + row_number().over(within))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("quality"),
        when(col("n") > 1, expr("(rk - 1) * 1000000 div (n - 1)"))
          .otherwise(lit(0L)).as("pr_ppm"))
      .orderBy("doc_id")
  }

  val qualityGlobalSql: String =
    s"""WITH q AS ($qualityScoreSql),
        r AS (SELECT doc_id, quality,
                row_number() OVER (ORDER BY quality, doc_id) AS rk,
                count(*) OVER () AS n
              FROM q)
        SELECT doc_id, quality,
          CAST(CASE WHEN n > 1 THEN (rk - 1) * 1000000 // (n - 1)
               ELSE 0 END AS BIGINT) AS pr_ppm
        FROM r ORDER BY doc_id"""
}
