package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/**
 * M3 — MinHash signature union as a typed Aggregator (the engine's UDAF
 * surface, SURVEY.md §2.3): element-wise minimum of signatures.
 *
 * MinHash's defining property makes this the *set-union* of signatures:
 * sig(A ∪ B)[i] = min(sig(A)[i], sig(B)[i]), so per-chunk/per-day
 * signatures can be merged without touching shingles again — the
 * incremental-recompute primitive behind checkpoint-resume
 * (BASELINE.json:14) and cluster-level signatures.
 *
 * Null/empty buffers are identities, so the aggregator is safe over
 * partial partitions.
 */
object MinHashUnion extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] = merge(buf, sig)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a == null || a.isEmpty) return b
    if (b == null || b.isEmpty) return a
    require(a.length == b.length, s"signature lengths differ: ${a.length} vs ${b.length}")
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = math.min(a(i), b(i)); i += 1 }
    out
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
  override def outputEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
}

private object ExprEncoders {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
