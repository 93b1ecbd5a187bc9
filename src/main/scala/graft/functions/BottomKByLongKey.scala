package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded exact bottom-k by an INTEGER sort key, as a typed Aggregator —
  * the [[TopKByScore]] shape with a Long key ordered ascending. The
  * integer key matters when the ordering is a 60-bit portable hash
  * (operators.Dedup.portableHash60): a Double score would round away the
  * low ~7 bits (53-bit mantissa) and could disagree with an engine
  * ordering the exact BIGINT, breaking the cross-engine oracle contract.
  *
  * Same scale story as TopKByScore: each group keeps a k-sized sorted
  * buffer merged associatively (ObjectHashAggregate with map-side partial
  * aggregation), so per-group selection never plans a window — with few
  * groups over a large corpus a window would sort a corpus-sized
  * partition per group.
  *
  * Input rows are (group, id, key); output is the k (key, id) pairs in
  * ascending (key, id) order.
  */
final class BottomKByLongKey(k: Int)
    extends Aggregator[(Long, Long, Long), Seq[(Long, Long)],
      Seq[(Long, Long)]] {

  /** true when a ranks strictly before b: smaller key, then smaller id. */
  private def before(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)],
      row: (Long, Long, Long)): Seq[(Long, Long)] = {
    val e = (row._3, row._2)
    if (buf.lengthCompare(k) >= 0 && !before(e, buf.last)) buf
    else {
      val (pre, post) = buf.span(before(_, e))
      (pre ++ (e +: post)).take(k)
    }
  }

  override def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && before(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
