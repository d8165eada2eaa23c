package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` keeping the top-k (value, id) pairs per group — the
  * §2.9 "typed Aggregator" tier, and a real scale win: the window-function
  * spelling (`row_number over (partition ... order by v desc) <= k`) SORTS
  * every group in full, while this aggregator holds a bounded k-element
  * buffer with map-side partial merges, O(n log k) and shuffle traffic of
  * k rows per group instead of n.
  *
  * Ties break on the smaller id, matching `ORDER BY v DESC, id` semantics,
  * so results are deterministic and oracle-comparable. Output is sorted
  * descending.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  // ascending ordering on (value, -id): the buffer head is the WORST kept
  // entry, evicted first. Smaller id wins ties, so at equal value the
  // larger id is "worse" (evicted first).
  private def worseFirst(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    insert(buf, in)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    if (buf.size < k) (in :: buf).sortWith(worseFirst)
    else if (worseFirst(in, buf.head)) buf
    else (in :: buf.tail).sortWith(worseFirst)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortWith((a, b) => worseFirst(b, a)) // best first

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  import org.apache.spark.sql.functions.udaf

  /** Column form usable in `df.groupBy(...).agg(topK(3)(col(v), col(id)))`;
    * result column is array<struct<_1: double, _2: bigint>> best-first. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg(k), org.apache.spark.sql.Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaLong))
}
