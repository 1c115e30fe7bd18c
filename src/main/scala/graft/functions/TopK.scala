package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-heap per-group top-k — the custom typed aggregate SURVEY.md §4/§7
  * sketches as the scale replacement for the `row_number()` window.
  *
  * The window form sorts EVERY group member (a full per-partition sort
  * after an exchange); this `Aggregator` keeps only k candidates per group
  * in a size-bounded heap, combines partially on the map side like any
  * other aggregate, and never materializes a group's full row set. At
  * 100 TB with millions of rows per group and k=75, the shuffle carries at
  * most k rows per group per map partition instead of the whole group.
  *
  * Ordering contract: descending by score, ascending by tag on ties — the
  * same deterministic order the engine's window top-k uses, so both
  * operators return identical rows.
  */
object TopK {

  /** One scored candidate: (tag, score) — e.g. (word, χ²) or
    * (orderkey, totalprice).
    */
  final case class Scored(tag: String, score: Double)

  /** Max-heap ordering whose root is the WORST kept element (lowest score,
    * then highest tag) — the element a better candidate evicts.
    */
  private val keepOrdering: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.tag))

  final class TopKAggregator(k: Int)(implicit seqEnc: Encoder[Seq[Scored]])
      extends Aggregator[Scored, mutable.PriorityQueue[Scored], Seq[Scored]] {

    override def zero: mutable.PriorityQueue[Scored] =
      mutable.PriorityQueue.empty(keepOrdering)

    private def offer(
        heap: mutable.PriorityQueue[Scored],
        s: Scored): mutable.PriorityQueue[Scored] = {
      if (heap.size < k) heap.enqueue(s)
      else if (keepOrdering.lt(s, heap.head)) { heap.dequeue(); heap.enqueue(s) }
      heap
    }

    override def reduce(heap: mutable.PriorityQueue[Scored], s: Scored) =
      offer(heap, s)

    override def merge(
        a: mutable.PriorityQueue[Scored], b: mutable.PriorityQueue[Scored]) =
      b.foldLeft(a)(offer)

    override def finish(heap: mutable.PriorityQueue[Scored]): Seq[Scored] =
      heap.toSeq.sortBy(s => (-s.score, s.tag))

    override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
      Encoders.kryo[mutable.PriorityQueue[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] = seqEnc
  }

  /** DataFrame-level helper: top-k rows per group of `df`, scored by
    * (scoreCol desc, tagCol asc). Output: (groupCol, tagCol, scoreCol) —
    * identical rows to the row_number()-window form (tag compared as
    * string, matching the window's word-asc tiebreak).
    */
  def topKPerGroup(
      df: DataFrame, groupCol: String, tagCol: String, scoreCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKAggregator(k)
    df.select(col(groupCol).cast("string").as("g"),
        col(tagCol).cast("string").as("tag"),
        col(scoreCol).cast("double").as("score"))
      .as[(String, String, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, t, s) => Scored(t, s) }
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (g, tops) => tops.map(t => (g, t.tag, t.score)) }
      .toDF(groupCol, tagCol, scoreCol)
  }
}
