package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** A witness entry of the cross-contamination gram index. */
final case class Witness(doc_id: Long, off: Int)

/**
 * Bounded top-k witness accumulation (VERDICT_r6 what's-wrong #2 / next
 * #5): the `cap` SMALLEST (doc_id, off) entries per gram, ascending —
 * byte-identical output to the `slice(array_sort(collect_list(struct(
 * doc_id, off))), 1, cap)` it replaces, but the aggregation buffer never
 * holds more than `cap` entries at ANY point, map-side partials included.
 * The previous shape buffered EVERY witness of a gram before capping, so a
 * pathological benchmark with one mega-hot gram buffered unboundedly
 * inside the aggregate; here the cap is real at any input skew.
 *
 * Buffer: interleaved (doc_id, off) longs, sorted lexicographically,
 * length ≤ 2·cap — unboxed, encoder-cheap. cap is small (default 8), so
 * linear insertion beats any tree structure.
 */
final class BoundedWitnesses(cap: Int)
    extends Aggregator[Witness, Array[Long], Seq[Witness]] {
  require(cap >= 1)

  override def zero: Array[Long] = Array.emptyLongArray

  @inline private def less(d1: Long, o1: Long, d2: Long, o2: Long): Boolean =
    d1 < d2 || (d1 == d2 && o1 < o2)

  override def reduce(buf: Array[Long], w: Witness): Array[Long] =
    insert(buf, w.doc_id, w.off.toLong)

  private def insert(buf: Array[Long], d: Long, o: Long): Array[Long] = {
    val n = buf.length / 2
    if (n == cap && !less(d, o, buf(2 * (cap - 1)), buf(2 * (cap - 1) + 1)))
      return buf // ranks past the cap — nothing to do
    var i = 0
    while (i < n && less(buf(2 * i), buf(2 * i + 1), d, o)) i += 1
    val m = math.min(n + 1, cap)
    val out = new Array[Long](2 * m)
    System.arraycopy(buf, 0, out, 0, 2 * i)
    out(2 * i) = d; out(2 * i + 1) = o
    if (i < m - 1) System.arraycopy(buf, 2 * i, out, 2 * (i + 1), 2 * (m - 1 - i))
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val m = math.min(a.length / 2 + b.length / 2, cap)
    val out = new Array[Long](2 * m)
    var i = 0; var j = 0; var w = 0
    while (w < m) {
      val takeA = j >= b.length ||
        (i < a.length && less(a(i), a(i + 1), b(j), b(j + 1)))
      if (takeA) { out(2 * w) = a(i); out(2 * w + 1) = a(i + 1); i += 2 }
      else { out(2 * w) = b(j); out(2 * w + 1) = b(j + 1); j += 2 }
      w += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Seq[Witness] =
    Seq.tabulate(buf.length / 2)(i => Witness(buf(2 * i), buf(2 * i + 1).toInt))

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Witness]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Witness]]()
}
