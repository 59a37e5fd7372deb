package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` (SURVEY §2.11): per-group top-k (value, id) pairs
  * via a bounded min-heap — O(n log k) per group with a k-sized buffer,
  * where the window-function formulation (`row_number` + filter) sorts
  * every partition. The buffer is tiny and mergeable, so partial
  * aggregation happens map-side before the shuffle: only k rows per
  * (partition, group) move, which at 100 TB is the difference between
  * shuffling the table and shuffling k×groups rows.
  *
  * Ties break toward the smaller id (deterministic output).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 > b._2) // "smaller" = worse rank

  /** Keep the buffer a sorted-ascending list of ≤ k best entries (the
    * head is the weakest survivor — cheap to evict).
    */
  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    if (buf.size < k) (x :: buf).sortWith(lt)
    else if (lt(x, buf.head)) buf
    else (x :: buf.tail).sortWith(lt)

  override def zero: List[(Double, Long)] = Nil
  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    insert(buf, x)
  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortWith((x, y) => lt(y, x)) // best first
  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  /** Column form: `top_k(value, id) → array<struct<_1,_2>>` (tuple
    * inputs flatten to one argument per field).
    */
  def topK(k: Int)(value: Column, id: Column): Column =
    udaf(new TopKAggregator(k)).apply(value, id)
}
