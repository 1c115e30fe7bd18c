package graft

import graft.textanalysis.{Bpe, CorpusOps}

/** Pins the BPE application contract (rank-order, left-to-right
  * non-overlapping passes) that both the Scala scan and the DuckDB
  * list_reduce oracle implement, plus the non-letter pre-token and
  * empty-doc edge cases `CORRECTNESS` can't isolate.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergePass is left-to-right non-overlapping") {
    // 'aaa' with rule (a,a): greedy scan takes the FIRST pair → [aa, a]
    assert(Bpe.mergePass(Array("a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "a"))
    assert(Bpe.mergePass(Array("a", "a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "aa"))
    // a fresh merge is not re-matched as the left operand in the same pass
    assert(Bpe.mergePass(Array("x", "y", "y"), "x", "y").toSeq ==
      Seq("xy", "y"))
  }

  test("encode applies merges strictly in rank order") {
    // single letters are base symbols, never merged away entirely unless
    // a rule exists; every piece must be a known symbol with an id
    for (w <- Seq("hash", "join", "batch", "query", "zzz")) {
      val ps = Bpe.encode(w)
      assert(ps.mkString == w, s"pieces must concatenate back to '$w'")
      ps.foreach(p => assert(Bpe.PieceId.contains(p), s"unknown piece $p"))
    }
    // determinism
    assert(Bpe.encode("hash") == Bpe.encode("hash"))
  }

  test("piece ids: base alphabet 0..25, merges 26.. in rank order") {
    assert(Bpe.PieceId("a") == 0 && Bpe.PieceId("z") == 25)
    Bpe.Merges.zipWithIndex.foreach { case ((l, r), i) =>
      assert(Bpe.PieceId(l + r) == 26 + i)
    }
  }

  test("bpeStats: non-letter pre-tokens count 1 piece / id 0; empty docs emit zero rows") {
    val dir = writeDocs(Seq(
      (1L, "hash hash join"), // letter runs, BPE-encoded
      (2L, "a1, b!"),         // pre-tokens: a,1,',',b,'!' → 5 pretok
      (3L, "")))              // no pre-tokens at all
    val out = Bpe.bpeStats(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val hashN = Bpe.encode("hash").length
    val joinN = Bpe.encode("join").length
    val hashS = Bpe.encode("hash").map(Bpe.PieceId(_).toLong).sum
    val joinS = Bpe.encode("join").map(Bpe.PieceId(_).toLong).sum
    assert(out(1L) == ((3L, 2L * hashN + joinN, 2L * hashS + joinS)))
    // 'a1, b!' pre-tokenizes to a | 1 | , | b | ! — letters a,b are base
    // pieces (ids 0, 1); digit/punct each 1 piece, id contribution 0
    assert(out(2L) == ((5L, 5L, 1L)))
    assert(out(3L) == ((0L, 0L, 0L)))
  }

  test("packBpe: per-shard start_tok is contiguous and pack_id = start div PackLen") {
    val dir = writeDocs((1L to 40L).map(i => (i, s"hash join batch row q$i")))
    val rows = Bpe.packBpe(spark, dir).collect()
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      var expect = 0L
      rs.sortBy(_.getLong(3)).foreach { r =>
        assert(r.getLong(3) == expect, "start_tok must be contiguous")
        assert(r.getLong(4) == expect / CorpusOps.PackLen)
        expect += r.getLong(2)
      }
    }
    // n_tok is the REAL subword count, not the whitespace count
    val one = rows.find(_.getLong(0) == 1L).get
    val words = Seq("hash", "join", "batch", "row", "q")
    assert(one.getLong(2) ==
      words.map(Bpe.encode(_).length).sum + 1) // + '1' digit pre-token
  }

  test("bpeEfficiency aggregates bpeStats per language exactly") {
    val sf = "/root/testdata/sf0.001"
    val rows = Bpe.bpeEfficiency(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val stats = Bpe.bpeStats(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "lang", "n_chars"), "doc_id")
      .select("lang", "n_chars", "n_pretok", "n_bpe")
      .as[(String, Long, Long, Long)].collect()
    val byLang = stats.groupBy(_._1)
    assert(rows.map(_._1).toSeq == byLang.keys.toSeq.sorted)
    rows.foreach { case (lang, nd, nc, np, nb, cpt, fert) =>
      val g = byLang(lang)
      assert(nd == g.length && nc == g.map(_._2).sum)
      assert(np == g.map(_._3).sum && nb == g.map(_._4).sum)
      assert(cpt == nc.toDouble / nb.toDouble)
      assert(fert == nb.toDouble / np.toDouble)
      assert(fert >= 1.0, "each pre-token yields at least one piece")
    }
  }

  // ------------------------------------------------------ 8k-rule artifact

  test("8k artifact: 8000 rules, unique outputs, operands constructible") {
    assert(Bpe.Merges8k.length == 8000)
    // PieceId8k's require() already enforces output uniqueness on load;
    // check the deeper training invariant here: every rule's operands
    // are base letters or outputs of strictly lower-ranked rules
    val seen = scala.collection.mutable.Set[String]()
    ('a' to 'z').foreach(c => seen += c.toString)
    Bpe.Merges8k.foreach { case (l, r) =>
      assert(seen(l) && seen(r), s"rule ($l,$r) references an unbuilt symbol")
      seen += (l + r)
    }
    assert(Bpe.PieceId8k.size == 26 + 8000)
  }

  test("ranked encoder is equivalent to 8000 rank-order passes") {
    // the ranked encoder (O(len^2), table-size-independent) must produce
    // byte-identical segmentations to the trainer's rank-pass convention
    // (which the DuckDB oracle replays) -- checked over the corpus vocab
    // plus LCG-generated random words, incl. shapes the synthetic
    // training corpus never saw
    var state = 987654321L
    def rnd(n: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % n) + n).toInt % n
    }
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val randomWords = (1 to 600).map { _ =>
      val len = 1 + rnd(14)
      (1 to len).map(_ => letters(rnd(26))).mkString
    }
    val corpusWords = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), " ")).as("w"))
      .distinct().as[String].collect().filter(_.matches("[a-z]+"))
    val words = (randomWords ++ corpusWords).distinct
    var anyMerged = false
    words.foreach { w =>
      val passes = Bpe.encodePasses(w, Bpe.Merges8k)
      val ranked = Bpe.encodeRanked(w, Bpe.Rank8k)
      assert(ranked == passes, s"divergence on '$w': $ranked vs $passes")
      assert(passes.mkString == w, "pieces must concatenate back to the word")
      if (passes.length < w.length) anyMerged = true
    }
    assert(anyMerged, "the 8k table must actually fire on real inputs")
    // corpus words rode the training set at high frequency: the 8k table
    // must compress them to single pieces
    corpusWords.foreach { w =>
      assert(Bpe.encodeRanked(w, Bpe.Rank8k).length == 1,
        s"corpus word '$w' not fully merged")
    }
  }
}
