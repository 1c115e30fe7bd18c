package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982) as a mergeable
  * typed Aggregator — the fixed-memory scale path for "top words over
  * 100 TB of text": k counters per partial aggregate, combined map-side
  * like any other aggregate, with the mergeable-summaries error bound of
  * Agarwal et al. 2012 (SIGMOD, "Mergeable Summaries") preserved across
  * arbitrary merge trees:
  *
  *   est(w) ≤ true(w) ≤ est(w) + (N − M)/(k+1)
  *
  * where N = stream length and M = the summary's retained count mass —
  * for absent words est(w) = 0, so every word with true(w) > (N−M)/(k+1)
  * is guaranteed present. `q_heavy_hitters` turns exactly these bounds
  * into oracle-asserted booleans (the `q_approx_stats` contract pattern).
  *
  * Buffer: parallel (word, count) arrays inside a product-encoded case
  * class — Spark's native struct codec, no Kryo object graphs (the
  * [[TopK]] buffer lesson). All scans are over ≤ k live slots; k is
  * small by construction (it bounds memory, not accuracy on its own).
  */
object MisraGries {

  /** Live slots are 0 until n; capacity 2k so a merge can stage both
    * sides before re-pruning.
    */
  final case class MgBuf(var n: Int, words: Array[String], counts: Array[Long])

  /** Final summary in deterministic (count desc, word asc) order. */
  final case class MgOut(words: Array[String], counts: Array[Long])

  final class MisraGriesAggregator(k: Int)
      extends Aggregator[String, MgBuf, MgOut] {
    require(k > 0, s"k must be positive, got $k")
    private val cap = 2 * k

    override def zero: MgBuf = MgBuf(0, new Array[String](cap), new Array[Long](cap))

    @inline private def indexOf(b: MgBuf, w: String): Int = {
      var i = 0
      while (i < b.n) { if (b.words(i) == w) return i; i += 1 }
      -1
    }

    /** Drop zero-count slots in place. */
    private def compact(b: MgBuf): Unit = {
      var out = 0; var i = 0
      while (i < b.n) {
        if (b.counts(i) > 0) {
          if (out != i) { b.words(out) = b.words(i); b.counts(out) = b.counts(i) }
          out += 1
        }
        i += 1
      }
      b.n = out
    }

    override def reduce(b: MgBuf, w: String): MgBuf = {
      val i = indexOf(b, w)
      if (i >= 0) b.counts(i) += 1
      else if (b.n < k) { b.words(b.n) = w; b.counts(b.n) = 1L; b.n += 1 }
      else {
        // all k counters busy with other words: decrement everyone —
        // the arriving word's implicit counter hits 0 and is dropped too
        var j = 0
        while (j < b.n) { b.counts(j) -= 1; j += 1 }
        compact(b)
      }
      b
    }

    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      var i = 0
      while (i < b.n) {
        val j = indexOf(a, b.words(i))
        if (j >= 0) a.counts(j) += b.counts(i)
        else { a.words(a.n) = b.words(i); a.counts(a.n) = b.counts(i); a.n += 1 }
        i += 1
      }
      if (a.n > k) {
        // subtract the (k+1)-th largest count from every slot and keep
        // the positives — the merge rule that preserves the (N−M)/(k+1)
        // bound (each subtraction is ≤ k+1 decrement groups' worth)
        val sorted = java.util.Arrays.copyOfRange(a.counts, 0, a.n)
        java.util.Arrays.sort(sorted)
        val thresh = sorted(a.n - (k + 1))
        var j = 0
        while (j < a.n) { a.counts(j) -= thresh; j += 1 }
        compact(a)
      }
      a
    }

    override def finish(b: MgBuf): MgOut = {
      val idx = Array.range(0, b.n).sortWith { (i, j) =>
        b.counts(i) > b.counts(j) ||
          (b.counts(i) == b.counts(j) && b.words(i) < b.words(j))
      }
      MgOut(idx.map(b.words), idx.map(b.counts))
    }

    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[MgOut] = Encoders.product[MgOut]
  }
}
