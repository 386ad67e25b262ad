package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate: keeps the k highest-scoring (score, id)
  * pairs, ties broken by ascending id — the aggregation-shaped
  * replacement for `row_number().over(partitionBy(q).orderBy(score
  * desc)) <= k`.
  *
  * Why it exists (scale): the window form shuffles EVERY candidate row
  * to its query's partition before ranking — for a k-NN join that is
  * the full candidate matrix (|q|·|c| rows). An Aggregator gets
  * map-side partial aggregation: each task reduces its slice to ≤ k
  * pairs per query before the shuffle, so the exchange carries
  * O(|q| · k · tasks) instead of O(|q| · |c|).
  *
  * Determinism: merge keeps a sorted vector ordered by
  * (score DESC, id ASC) and truncates at k — associative and
  * insensitive to partial-merge order, so results are stable across
  * partitionings and equal to the window form.
  */
final case class Scored(score: Double, id: Long)

final class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    insert(buf, a)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    b2.foldLeft(b1)(insert)

  private def insert(buf: Seq[Scored], a: Scored): Seq[Scored] = {
    if (buf.size >= k && ord.gteq(a, buf.last)) buf
    else {
      val i = buf.indexWhere(ord.gt(_, a)) match {
        case -1 => buf.size
        case n => n
      }
      val out = (buf.take(i) :+ a) ++ buf.drop(i)
      if (out.size > k) out.take(k) else out
    }
  }

  override def finish(r: Seq[Scored]): Seq[Scored] = r
  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopKByScore {
  /** Column-level API: `top_k(score, id)` → array<struct<score,id>>
    * sorted by (score desc, id asc), length ≤ k.
    */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKByScore(k), org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Scored]())
      .apply(score, id)
}
