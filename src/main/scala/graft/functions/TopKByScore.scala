package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded exact top-k as a typed Aggregator: each group keeps a k-sized
  * sorted buffer (score desc, id asc tie-break), merged associatively — so
  * exact per-key top-k runs as an ObjectHashAggregate with MAP-SIDE partial
  * aggregation, never a window. The window form
  * (`row_number() OVER (PARTITION BY key ORDER BY ...)` then `<= k`) sorts
  * each key's ENTIRE partition on one task; with few keys over a large
  * corpus (the knn shape: 5 query vectors × the whole embedding table) that
  * is a full corpus sort per key. Here every input partition contributes at
  * most k candidates per key to the shuffle — the reduction happens where
  * the data lives, and the exchange carries O(keys × k) rows.
  *
  * Input rows are (key, id, score); the key is the grouping column and rides
  * along unused. Output is the k (score, id) pairs in rank order.
  */
final class TopKByScore(k: Int)
    extends Aggregator[(Long, Long, Double), Seq[(Double, Long)],
      Seq[(Double, Long)]] {

  /** true when a ranks strictly before b: higher score, then smaller id. */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
      row: (Long, Long, Double)): Seq[(Double, Long)] = {
    val e = (row._3, row._2)
    if (buf.lengthCompare(k) >= 0 && !before(e, buf.last)) buf
    else {
      val (pre, post) = buf.span(before(_, e))
      (pre ++ (e +: post)).take(k)
    }
  }

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // merge two rank-sorted buffers, keep the first k
    val out = Seq.newBuilder[(Double, Long)]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && before(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
