package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate. */
final case class Scored(vec_id: Long, score: Double)

/** Bounded top-k aggregator: the 100 TB shape for per-key nearest
  * neighbors. State is AT MOST k elements, so partial aggregation runs
  * map-side (per input partition) and only (#keys × k) rows ever cross
  * the exchange — unlike a `Window.partitionBy(key)` rank, which ships
  * EVERY score to one task per key.
  *
  * Ordering is total — (score desc, vec_id asc) — so merges are
  * associative/commutative and the result is deterministic regardless of
  * partitioning.
  */
final class TopKByScore(k: Int)
    extends Aggregator[Scored, List[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.vec_id < b.vec_id)

  override def zero: List[Scored] = Nil

  override def reduce(buf: List[Scored], x: Scored): List[Scored] = {
    // insert into a ≤k descending list; drop the tail beyond k
    val (hi, lo) = buf.span(better(_, x))
    val merged = hi ::: x :: lo
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  override def merge(a: List[Scored], b: List[Scored]): List[Scored] = {
    @annotation.tailrec
    def go(x: List[Scored], y: List[Scored], n: Int, acc: List[Scored]): List[Scored] =
      if (n == 0) acc.reverse
      else (x, y) match {
        case (Nil, Nil) => acc.reverse
        case (xs, Nil) => acc.reverse ::: xs.take(n)
        case (Nil, ys) => acc.reverse ::: ys.take(n)
        case (xh :: xt, yh :: _) if better(xh, yh) => go(xt, y, n - 1, xh :: acc)
        case (_, yh :: yt) => go(x, yt, n - 1, yh :: acc)
      }
    go(a, b, k, Nil)
  }

  override def finish(r: List[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopKByScore {
  /** Convenience: typed column for `groupByKey(...).agg(...)`. */
  def column(k: Int): org.apache.spark.sql.TypedColumn[Scored, Seq[Scored]] =
    new TopKByScore(k).toColumn
}
