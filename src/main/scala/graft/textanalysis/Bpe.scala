package graft.textanalysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing.duckH48

/** Real subword tokenization: applies a committed BPE merge-table artifact
  * (`src/main/resources/bpe_merges.txt`, trained offline by
  * `tools/train_bpe.py` — the stopword-artifact pattern, reference
  * `src/data/stopwords.txt`, generalized to a model file) to produce
  * loader-true token counts and ids, replacing the BPE-ish regex
  * *estimate* in [[TextAnalysis.tokenStats]].
  *
  * Application convention (training-faithful, mirrored bit-exactly by the
  * DuckDB oracle): merges apply strictly in rank order; each rule is one
  * left-to-right non-overlapping pass over the symbol sequence. For a
  * table produced by actual BPE training this equals the canonical
  * best-ranked-pair loop: rule k's operand symbols are constructible only
  * by rules < k, and merging other symbols never creates a new adjacency
  * of two already-existing symbols, so by the time rule k runs, every
  * occurrence it could ever see is present.
  *
  * Scale design (100 TB): BPE encoding is an iterative per-word algorithm
  * no relational expression covers, so it runs as a typed map — but over
  * the DISTINCT pre-token vocabulary only (Zipf-bounded: millions of
  * words, not trillions of tokens), built with one map-side-combined
  * distinct. The word→(pieces, ids) table then broadcast-joins back onto
  * the exploded corpus, keeping the corpus-side pass narrow: one scan,
  * one broadcast probe, one partial-aggregated groupBy(doc_id). The
  * encode cost is O(|vocab| · rules), independent of corpus size — the
  * word-level cache every production tokenizer (HF fast tokenizers) uses,
  * here as a dataflow instead of a process-local memo.
  */
object Bpe {

  private def loadMerges(resource: String): IndexedSeq[(String, String)] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"$resource missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty)
      .map { line =>
        val Array(l, r) = line.split(" ", 2)
        (l, r)
      }.toIndexedSeq
    finally in.close()
  }

  /** Merge rules in rank order from the committed artifact. */
  val Merges: IndexedSeq[(String, String)] = loadMerges("/bpe_merges.txt")

  /** The PRODUCTION-SCALE artifact: 8,000 merges trained by
    * `tools/train_bpe.py --synthetic` on a deterministic 30k-word
    * morphology corpus (the 31-word test pool cannot ground a realistic
    * table; the synthetic vocabulary is the FIXTURES.md pattern, and the
    * corpus words ride in it at high frequency so this table genuinely
    * compresses them). Lazy: the 48-rule table stays the byte-pinned
    * spec anchor; this one exists to prove the encoding path holds at
    * real tokenizer size.
    */
  lazy val Merges8k: IndexedSeq[(String, String)] =
    loadMerges("/bpe_merges_8k.txt")

  /** symbol → id: base alphabet 'a'..'z' = 0..25, merge outputs 26.. in
    * rank order. The trainer guarantees output-string uniqueness (it
    * skips colliding candidates); enforced again here because the id map
    * — and the oracle's `m.l || m.r = sym` join — both rely on it.
    */
  private def pieceIds(
      merges: IndexedSeq[(String, String)]): Map[String, Int] = {
    val base = ('a' to 'z').map(c => (c.toString, c - 'a')).toMap
    val merged = merges.zipWithIndex.map { case ((l, r), i) => (l + r, 26 + i) }
    require(merged.map(_._1).distinct.size == merged.size &&
      merged.forall { case (s, _) => !base.contains(s) },
      "merge-table output strings must be unique")
    base ++ merged
  }

  val PieceId: Map[String, Int] = pieceIds(Merges)

  lazy val PieceId8k: Map[String, Int] = pieceIds(Merges8k)

  /** pair → rank for the ranked encoder (the scale path). */
  lazy val Rank8k: Map[(String, String), Int] =
    Merges8k.zipWithIndex.toMap

  /** One left-to-right non-overlapping merge pass. Equivalent to the
    * oracle's `list_reduce` left-fold: the fold merges `x` into the
    * accumulator only when the trailing symbol is exactly `l`, and a
    * fresh merge leaves trailing symbol `l+r` ≠ `l` (r nonempty), so the
    * fold, like this scan, consumes disjoint adjacent pairs greedily.
    */
  private[graft] def mergePass(
      syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one lowercase letter-run word into BPE pieces: the rank-pass
    * form — one pass per rule, the trainer's own application convention.
    * O(rules·len) per word: fine at 48 rules, NOT the shape for 8k.
    */
  def encode(word: String): Seq[String] =
    encodePasses(word, Merges)

  private[graft] def encodePasses(
      word: String, merges: IndexedSeq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toArray
    val it = merges.iterator
    while (it.hasNext && syms.length > 1) {
      val (l, r) = it.next()
      syms = mergePass(syms, l, r)
    }
    syms.toSeq
  }

  /** The RANKED encoder — the production shape for large tables:
    * repeatedly find the lowest-rank adjacent pair present in the
    * sequence (hash lookup per adjacency) and run one non-overlapping
    * pass for it. Cost O(len²) per word, INDEPENDENT of table size —
    * this is what makes an 8k-rule (or 100k-rule) tokenizer usable,
    * where the rank-pass form pays O(rules) per word even when nothing
    * fires. For a table produced by actual BPE training the two are
    * equivalent (the rank-order argument in the object doc: by the time
    * rule k could fire, every lower-ranked rule has exhausted its
    * occurrences — which is exactly the order this encoder applies
    * them in); `BpeSpec` machine-checks the equivalence over random
    * words against the full 8k table.
    */
  def encodeRanked(
      word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toArray
    var go = true
    while (go && syms.length > 1) {
      var best = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bl = syms(i); br = syms(i + 1) }
        i += 1
      }
      if (best == Int.MaxValue) go = false
      else syms = mergePass(syms, bl, br)
    }
    syms.toSeq
  }

  /** Per-doc counts WITHOUT the presentation sort — the composable form
    * [[packBpe]] builds on. Letter-run pre-tokens are BPE-encoded;
    * digit/punctuation pre-tokens count as one piece with id
    * contribution 0 (none exist in the synthetic corpus; the contract is
    * spec-pinned on a fixture).
    */
  private[textanalysis] def bpeCounts(
      spark: SparkSession, dir: String): DataFrame =
    bpeCountsWith(spark, dir, encode, PieceId)

  /** [[bpeCounts]] under the 8k production table, encoded by the RANKED
    * encoder — the declared proof that the distinct-vocabulary broadcast
    * pattern survives real tokenizer size: the corpus-side plan is
    * IDENTICAL to the 48-rule query (one scan, one broadcast probe, one
    * partial-agg groupBy); only the per-distinct-word encode function
    * changed, and with the ranked encoder its cost is O(len²) per word
    * regardless of the 167× larger table.
    */
  private[textanalysis] def bpeCounts8k(
      spark: SparkSession, dir: String): DataFrame =
    bpeCountsWith(spark, dir,
      w => encodeRanked(w, Rank8k), PieceId8k)

  private def bpeCountsWith(
      spark: SparkSession, dir: String,
      encodeFn: String => Seq[String],
      pieceId: Map[String, Int]): DataFrame = {
    import spark.implicits._
    val pre = TextAnalysis.docs(spark, dir)
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")),
          lit(TextAnalysis.BpeTokenRegex), lit(0))).as("w"))
    val enc = pre.select("w").where(col("w").rlike("^[a-z]+$")).distinct()
      .as[String]
      .map { w =>
        val ps = encodeFn(w)
        (w, ps.length, ps.map(p => pieceId(p).toLong).sum)
      }
      .toDF("w", "n_pieces", "id_sum")
    val agg = pre.join(broadcast(enc), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pretok"),
        sum(coalesce(col("n_pieces"), lit(1))).as("n_bpe"),
        sum(coalesce(col("id_sum"), lit(0L))).as("id_sum"))
    // docs spine left join: empty/null texts must emit zero-stat rows,
    // not vanish (they produce no exploded pre-tokens)
    TextAnalysis.docs(spark, dir).select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pretok"), lit(0L)).as("n_pretok"),
        coalesce(col("n_bpe"), lit(0L)).as("n_bpe"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum"))
  }

  /** Declared query: (doc_id, n_pretok, n_bpe, id_sum) per document. */
  def bpeStats(spark: SparkSession, dir: String): DataFrame =
    bpeCounts(spark, dir).orderBy("doc_id")

  /** Declared query: the same per-doc stats under the 8,000-rule table. */
  def bpeStats8k(spark: SparkSession, dir: String): DataFrame =
    bpeCounts8k(spark, dir).orderBy("doc_id")

  private def sqlQuote(s: String) = "'" + s.replace("'", "''") + "'"

  /** Shared CTE chain (caller supplies `WITH RECURSIVE`): the merge table
    * inlined from the artifact, the vocabulary, the rank-order fold, and
    * the per-doc aggregate `bpe(doc_id, n_pretok, n_bpe, id_sum)`.
    */
  private[textanalysis] val bpeCtes: String = {
    val mergeValues = Merges.zipWithIndex
      .map { case ((l, r), i) => s"(${i + 1},${sqlQuote(l)},${sqlQuote(r)})" }
      .mkString(",")
    s"""merges(rank, l, r) AS (SELECT * FROM (VALUES $mergeValues) m(rank, l, r)),
        pre AS (SELECT doc_id,
            unnest(regexp_extract_all(lower(text), '${TextAnalysis.BpeTokenRegex}')) AS w
          FROM documents),
        vocab AS (SELECT DISTINCT w FROM pre WHERE regexp_matches(w, '^[a-z]+${"$"}')),
        enc(w, i, s) AS (
          SELECT w, 0, array_to_string(string_split(w, ''), ' ') FROM vocab
          UNION ALL
          SELECT e.w, e.i + 1,
            list_reduce(string_split(e.s, ' '),
              (acc, x) -> CASE WHEN x = m.r AND (acc = m.l OR ends_with(acc, ' ' || m.l))
                          THEN acc || x ELSE acc || ' ' || x END)
          FROM enc e JOIN merges m ON m.rank = e.i + 1),
        done AS (SELECT w, string_split(s, ' ') AS ps
          FROM enc WHERE i = ${Merges.length}),
        piece AS (SELECT w, len(ps) AS n_pieces, unnest(ps) AS sym FROM done),
        wenc AS (SELECT p.w, any_value(p.n_pieces) AS n_pieces,
            sum(CASE WHEN len(p.sym) = 1 THEN ascii(p.sym) - 97
                     ELSE m.rank + 25 END) AS id_sum
          FROM piece p LEFT JOIN merges m
            ON len(p.sym) > 1 AND m.l || m.r = p.sym
          GROUP BY p.w),
        docagg AS (SELECT pre.doc_id, count(*) AS n_pretok,
            sum(coalesce(we.n_pieces, 1)) AS n_bpe,
            sum(coalesce(we.id_sum, 0)) AS id_sum
          FROM pre LEFT JOIN wenc we ON we.w = pre.w GROUP BY 1),
        bpe AS (SELECT d.doc_id,
            CAST(coalesce(a.n_pretok, 0) AS BIGINT) AS n_pretok,
            CAST(coalesce(a.n_bpe, 0) AS BIGINT) AS n_bpe,
            CAST(coalesce(a.id_sum, 0) AS BIGINT) AS id_sum
          FROM documents d LEFT JOIN docagg a ON a.doc_id = d.doc_id)"""
  }

  val bpeStatsSql: String =
    s"""WITH RECURSIVE $bpeCtes
        SELECT doc_id, n_pretok, n_bpe, id_sum FROM bpe ORDER BY doc_id"""

  /** Oracle CTE chain for the 8k table. A naive port of [[bpeCtes]]
    * would recurse 8,000 ranks deep over every vocab word — the oracle
    * itself must stay tractable at production table size, so it uses
    * the FILTERED-RANK recursion: rule (l, r) can only ever fire on
    * word w if `l || r` is a substring of w (pieces are contiguous
    * substrings in order, so any adjacent pair concatenates to one),
    * and merge outputs are unique strings, so each word matches at most
    * len·(len+1)/2 rules. Per word, keep only its matching rules in
    * rank order and fold through those — identical states at every
    * firing opportunity, recursion depth = max matching rules per word
    * (tens), not 8,000.
    */
  private[textanalysis] val bpeCtes8k: String = {
    val mergeValues = Merges8k.zipWithIndex
      .map { case ((l, r), i) => s"(${i + 1},${sqlQuote(l)},${sqlQuote(r)})" }
      .mkString(",")
    s"""merges(rank, l, r) AS (SELECT * FROM (VALUES $mergeValues) m(rank, l, r)),
        pre AS (SELECT doc_id,
            unnest(regexp_extract_all(lower(text), '${TextAnalysis.BpeTokenRegex}')) AS w
          FROM documents),
        vocab AS (SELECT DISTINCT w FROM pre WHERE regexp_matches(w, '^[a-z]+${"$"}')),
        wrules AS (SELECT v.w, m.l, m.r,
            row_number() OVER (PARTITION BY v.w ORDER BY m.rank) AS j
          FROM vocab v JOIN merges m ON strpos(v.w, m.l || m.r) > 0),
        nr AS (SELECT w, count(*) AS n FROM wrules GROUP BY w),
        enc(w, j, s) AS (
          SELECT w, 0, array_to_string(string_split(w, ''), ' ') FROM vocab
          UNION ALL
          SELECT e.w, e.j + 1,
            list_reduce(string_split(e.s, ' '),
              (acc, x) -> CASE WHEN x = r.r AND (acc = r.l OR ends_with(acc, ' ' || r.l))
                          THEN acc || x ELSE acc || ' ' || x END)
          FROM enc e JOIN wrules r ON r.w = e.w AND r.j = e.j + 1),
        done AS (SELECT e.w, string_split(e.s, ' ') AS ps
          FROM enc e LEFT JOIN nr ON nr.w = e.w
          WHERE e.j = coalesce(nr.n, 0)),
        piece AS (SELECT w, len(ps) AS n_pieces, unnest(ps) AS sym FROM done),
        wenc AS (SELECT p.w, any_value(p.n_pieces) AS n_pieces,
            sum(CASE WHEN len(p.sym) = 1 THEN ascii(p.sym) - 97
                     ELSE m.rank + 25 END) AS id_sum
          FROM piece p LEFT JOIN merges m
            ON len(p.sym) > 1 AND m.l || m.r = p.sym
          GROUP BY p.w),
        docagg AS (SELECT pre.doc_id, count(*) AS n_pretok,
            sum(coalesce(we.n_pieces, 1)) AS n_bpe,
            sum(coalesce(we.id_sum, 0)) AS id_sum
          FROM pre LEFT JOIN wenc we ON we.w = pre.w GROUP BY 1),
        bpe AS (SELECT d.doc_id,
            CAST(coalesce(a.n_pretok, 0) AS BIGINT) AS n_pretok,
            CAST(coalesce(a.n_bpe, 0) AS BIGINT) AS n_bpe,
            CAST(coalesce(a.id_sum, 0) AS BIGINT) AS id_sum
          FROM documents d LEFT JOIN docagg a ON a.doc_id = d.doc_id)"""
  }

  val bpeStats8kSql: String =
    s"""WITH RECURSIVE $bpeCtes8k
        SELECT doc_id, n_pretok, n_bpe, id_sum FROM bpe ORDER BY doc_id"""

  /** Tokenizer-efficiency report — the eval that decides whether a
    * tokenizer (merge table) is worth shipping: per language,
    * chars-per-subword-token (compression rate; higher = cheaper
    * training per char) and subwords-per-pretoken (fertility; 1.0 =
    * every word is one piece). Uses the stored `n_chars` column rather
    * than re-measuring text so both engines count the same chars, and
    * the committed merge-table artifact via [[bpeCounts]] — encoding
    * cost stays O(vocab·rules) through the distinct-vocabulary
    * broadcast, so the report is one corpus pass + a tiny groupBy(lang).
    * Ratios are single divisions of exact integer sums (engine-exact).
    */
  def bpeEfficiency(spark: SparkSession, dir: String): DataFrame = {
    val d = TextAnalysis.docs(spark, dir).select("doc_id", "lang", "n_chars")
    bpeCounts(spark, dir).join(d, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
        sum("n_pretok").as("n_pretok"), sum("n_bpe").as("n_bpe"))
      .select(col("lang"), col("n_docs"), col("n_chars"),
        col("n_pretok"), col("n_bpe"),
        (col("n_chars").cast("double") / col("n_bpe").cast("double"))
          .as("chars_per_token"),
        (col("n_bpe").cast("double") / col("n_pretok").cast("double"))
          .as("fertility"))
      .orderBy("lang")
  }

  val bpeEfficiencySql: String =
    s"""WITH RECURSIVE $bpeCtes
        SELECT d.lang, count(*) AS n_docs,
          CAST(sum(d.n_chars) AS BIGINT) AS n_chars,
          CAST(sum(bpe.n_pretok) AS BIGINT) AS n_pretok,
          CAST(sum(bpe.n_bpe) AS BIGINT) AS n_bpe,
          CAST(sum(d.n_chars) AS DOUBLE) / CAST(sum(bpe.n_bpe) AS DOUBLE)
            AS chars_per_token,
          CAST(sum(bpe.n_bpe) AS DOUBLE) / CAST(sum(bpe.n_pretok) AS DOUBLE)
            AS fertility
        FROM bpe JOIN documents d USING (doc_id)
        GROUP BY d.lang ORDER BY d.lang"""

  /** Loader-true sequence packing: [[CorpusOps.packSequences]]'s stream
    * policy re-based on REAL subword counts instead of whitespace-token
    * counts, so `start_tok`/`pack_id` offsets are the ones a training
    * loader consuming this tokenizer would seek to.
    */
  def packBpe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = CorpusOps.shardKey(col("doc_id"))
    val w = Window.partitionBy("shard").orderBy("sort_key", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bpeCounts(spark, dir)
      .select(col("doc_id"),
        (key % CorpusOps.NShards).cast("int").as("shard"),
        key.as("sort_key"), col("n_bpe").as("n_tok"))
      .withColumn("start_tok", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("pack_id", expr(s"start_tok div ${CorpusOps.PackLen}"))
      .select("doc_id", "shard", "n_tok", "start_tok", "pack_id")
      .orderBy("shard", "start_tok", "doc_id")
  }

  val packBpeSql: String = {
    val key = duckH48("concat('shard-', doc_id)")
    s"""WITH RECURSIVE $bpeCtes,
        t AS (SELECT doc_id,
            CAST($key % ${CorpusOps.NShards} AS INT) AS shard,
            $key AS sort_key, n_bpe AS n_tok
          FROM bpe),
        c AS (SELECT doc_id, shard, n_tok,
            -- CAST: DuckDB widens the window sum to HUGEINT
            CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY sort_key, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              - n_tok AS start_tok
          FROM t)
        SELECT doc_id, shard, n_tok, start_tok,
          start_tok // ${CorpusOps.PackLen} AS pack_id
        FROM c ORDER BY shard, start_tok, doc_id"""
  }
}
