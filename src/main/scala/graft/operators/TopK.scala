package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator — the cluster-scale form of
  * "rank per group with a window". A window must co-locate and sort
  * EVERY candidate row of a group on one partition before discarding
  * all but k; this aggregator keeps only k rows per group in each
  * partition's partial state, so the shuffle moves O(k) rows per
  * group instead of O(candidates). At 10^9 candidates per probe
  * (100 TB brute-force scoring) that is the difference between a
  * straggler sort and a flat partial-state merge.
  *
  * Ordering matches the similarity family's ranking exactly:
  * (score desc, id asc) — ties deterministic, so the output is
  * bit-identical to the window formulation (proved by
  * the default `sim_cosine_topk` sharing the windowed twin's oracle).
  */
object TopK {

  /** One scored candidate within a group. */
  final case class Scored(qid: Long, score: Double, id: Long, payload: Long)

  /** Bounded top-k state: a sorted Vector of at most k entries.
    * O(k) insertion per row is the right trade — k is a page of
    * results, the candidate stream is what's huge.
    */
  final class TopKAggregator(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    private def insert(buf: Seq[Scored], s: Scored): Seq[Scored] =
      if (buf.size >= k && better(buf.last, s)) buf
      else {
        val i = buf.indexWhere(e => better(s, e)) match {
          case -1 => buf.size
          case ix => ix
        }
        (buf.take(i) :+ s) ++ buf.drop(i).take(k - i - 1)
      }

    def zero: Seq[Scored] = Vector.empty
    def reduce(buf: Seq[Scored], s: Scored): Seq[Scored] = insert(buf, s)
    def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = b.foldLeft(a)(insert)
    def finish(buf: Seq[Scored]): Seq[Scored] = buf
    def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }
}
