package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom Catalyst scalar expressions for the dedup pipeline (SURVEY.md §2.3,
 * §2.5: ops S1, M1, M2, V1). All are pure, deterministic, null-safe, and
 * evaluate directly over Tungsten representations (UTF8String bytes in,
 * UnsafeArrayData out) — no UDF serialization round-trip.
 *
 * Codegen strategy: doGenCode delegates to the compiled eval via an object
 * reference (the expression bodies are branch-heavy scalar JVM code the JIT
 * already optimizes); what this buys over CodegenFallback is that the
 * SURROUNDING operator stays inside WholeStageCodegen — with fallback, the
 * whole Project/Filter degrades to interpreted row processing (observed in
 * plans: no codegen stage around the signature projection).
 */
private[functions] trait DelegatedUnaryCodegen { self: UnaryExpression =>
  /** public bridge so generated code can call the protected eval */
  final def compute(input: Any): Any = nullSafeEval(input)
  /** cast applied to compute's boxed result in generated code */
  protected def resultCast: String
  /** true when the result can be null even for a non-null input */
  protected def resultNullable: Boolean = false
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("expr", this)
    nullSafeCodeGen(ctx, ev, c =>
      if (resultNullable)
        s"Object r = $ref.compute($c);\n" +
          s"if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = $resultCast r; }"
      else s"${ev.value} = $resultCast $ref.compute($c);")
  }
}

private[functions] trait DelegatedBinaryCodegen { self: BinaryExpression =>
  final def compute(a: Any, b: Any): Any = nullSafeEval(a, b)
  protected def resultCast: String
  protected def resultNullable: Boolean = false
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("expr", this)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (resultNullable)
        s"Object r = $ref.compute($a, $b);\n" +
          s"if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = $resultCast r; }"
      else s"${ev.value} = $resultCast $ref.compute($a, $b);")
  }
}
private[graft] object Tok {
  /** Byte offsets of space-separated tokens in UTF-8 `bytes`: flat array of
    * (start, end) pairs. The space byte 0x20 never occurs inside a UTF-8
    * multi-byte sequence, so byte scanning is code-point safe. Empty tokens
    * (leading/trailing/double spaces) are skipped. */
  def tokenSpans(bytes: Array[Byte], len: Int): Array[Int] = {
    val spans = new java.util.ArrayList[Integer](64)
    var i = 0
    var start = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        if (i > start) { spans.add(start); spans.add(i) }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Int](spans.size())
    var j = 0
    while (j < out.length) { out(j) = spans.get(j); j += 1 }
    out
  }

  /** True iff the text is already canonical: single spaces, no leading or
    * trailing space — then word shingles are contiguous byte spans of the
    * original buffer and can be hashed with zero copies. */
  def isCanonicalSpacing(bytes: Array[Byte], len: Int): Boolean = {
    if (len == 0) return true
    if (bytes(0) == ' ' || bytes(len - 1) == ' ') return false
    var i = 1
    while (i < len) {
      if (bytes(i) == ' ' && bytes(i - 1) == ' ') return false
      i += 1
    }
    true
  }

  /** Rebuild with single spaces (no leading/trailing) so word-gram spans
    * match the canonical single-space-joined form; returns (buffer, len). */
  def canonicalizeSpaces(raw: Array[Byte]): (Array[Byte], Int) = {
    val out = new Array[Byte](raw.length)
    var w = 0
    var i = 0
    var pendingSpace = false
    while (i < raw.length) {
      val b = raw(i)
      if (b == ' ') { if (w > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out(w) = ' '; w += 1; pendingSpace = false }
        out(w) = b; w += 1
      }
      i += 1
    }
    (out, w)
  }

  /** Sort ascending and dedupe in place; returns possibly-shorter array. */
  def sortedDistinct(a: Array[Long], n: Int): Array[Long] = {
    java.util.Arrays.sort(a, 0, n)
    var w = 0
    var i = 0
    while (i < n) {
      if (w == 0 || a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    if (w == a.length) a else java.util.Arrays.copyOf(a, w)
  }
}

/**
 * S1 — word/byte k-shingles of a text, each hashed with xxhash64(seed);
 * output is distinct and ascending (JaccardSorted's precondition).
 *
 * Invariant (unit-tested): for canonical single-spaced text, word-mode output
 * equals `array_sort(array_distinct(transform(<k-gram strings>, s ->
 * xxhash64(s))))` built from Spark builtins — each shingle hash is the
 * xxhash64 of the UTF-8 bytes of the k tokens joined by a single space.
 * Texts with fewer than k tokens yield an empty array.
 */
case class ShingleHashes(child: Expression, unit: String, k: Int, seed: Long)
    extends UnaryExpression with DelegatedUnaryCodegen {
  require(k >= 1)
  override protected def resultCast: String = "(org.apache.spark.sql.catalyst.util.ArrayData)"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val utf8 = input.asInstanceOf[UTF8String]
    val raw = utf8.getBytes
    val hashes =
      if (unit == "char") byteGrams(raw, raw.length)
      else {
        val (bytes, len) =
          if (Tok.isCanonicalSpacing(raw, raw.length)) (raw, raw.length)
          else Tok.canonicalizeSpaces(raw)
        wordGrams(bytes, len)
      }
    UnsafeArrayData.fromPrimitiveArray(hashes)
  }

  private def wordGrams(bytes: Array[Byte], len: Int): Array[Long] = {
    val spans = Tok.tokenSpans(bytes, len)
    val nTok = spans.length / 2
    val n = nTok - k + 1
    if (n <= 0) return Array.emptyLongArray
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val from = spans(2 * i)                  // start of token i
      val to = spans(2 * (i + k - 1) + 1)      // end of token i+k-1
      out(i) = Xxh.hashBytes(bytes, from, to - from, seed)
      i += 1
    }
    Tok.sortedDistinct(out, n)
  }

  private def byteGrams(bytes: Array[Byte], len: Int): Array[Long] = {
    val n = len - k + 1
    if (n <= 0) return Array.emptyLongArray
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = Xxh.hashBytes(bytes, i, k, seed); i += 1 }
    Tok.sortedDistinct(out, n)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/**
 * Within-doc n-gram repetition statistics in ONE fused pass (op TX11's
 * kernel): tokenize (space-split, empties skipped), hash every overlapping
 * n-token gram (xxhash64 of the single-space-joined gram bytes — the
 * ShingleHashes identity, so equal gram token sequences hash equal for any
 * input spacing), sort, run-scan. Returns struct(n_grams, n_distinct_grams,
 * top_gram_count) — the three integers [Rae21]-style repetition filters
 * derive their fractions from.
 *
 * Replaces (r7) a transform/array_join/array_sort/aggregate builtin chain:
 * higher-order functions evaluate their lambdas interpreted per element and
 * materialize every gram STRING — measured 11.3 s CPU over 5000 docs at
 * sf0.1 vs ~0.2 s for this expression (guide §4: keep the hot path out of
 * interpreted evaluation). Gram identity is the 64-bit hash — the same
 * exact-dedup trade (2^-64 birthday term per doc) the corpus ops pin
 * everywhere (q08/q09/q40).
 */
case class NgramStats(child: Expression, n: Int, seed: Long)
    extends UnaryExpression with DelegatedUnaryCodegen {
  require(n >= 1)
  override protected def resultCast: String = "(org.apache.spark.sql.catalyst.InternalRow)"
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false),
    StructField("top_gram_count", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ngram_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].getBytes
    val (bytes, len) =
      if (Tok.isCanonicalSpacing(raw, raw.length)) (raw, raw.length)
      else Tok.canonicalizeSpaces(raw)
    val spans = Tok.tokenSpans(bytes, len)
    val nTok = spans.length / 2
    val m = nTok - n + 1
    if (m <= 0) return InternalRow(0L, 0L, 0L)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val from = spans(2 * i)
      val to = spans(2 * (i + n - 1) + 1)
      hs(i) = Xxh.hashBytes(bytes, from, to - from, seed)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var distinct = 0L
    var top = 0L
    var run = 0L
    i = 0
    while (i < m) {
      if (i == 0 || hs(i) != hs(i - 1)) { distinct += 1; run = 1L }
      else run += 1
      if (run > top) top = run
      i += 1
    }
    InternalRow(m.toLong, distinct, top)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)
}

/**
 * M1 — batched MinHash signature [Broder97]. For permutation i:
 * sig[i] = min over shingle hashes h of (a_i * (h mod p) + b_i) mod p,
 * p = 2^61 - 1, (a_i, b_i) drawn from SplittableRandom(seed) (algorithm
 * fixed by the JDK spec ⇒ stable across JVMs). "Batched": one pass over the
 * shingle array updates all numPerm accumulators (BASELINE.json:6).
 * Empty shingle array ⇒ null (such docs never enter banding).
 */
case class MinHashSig(child: Expression, numPerm: Int, seed: Long)
    extends UnaryExpression with DelegatedUnaryCodegen {
  import Mersenne61._
  override protected def resultCast: String = "(org.apache.spark.sql.catalyst.util.ArrayData)"
  override protected def resultNullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = MinHashSig.params(numPerm, seed)

  override protected def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    if (shingles.isEmpty) return null
    val acc = new Array[Long](numPerm)
    java.util.Arrays.fill(acc, Long.MaxValue)
    var j = 0
    while (j < shingles.length) {
      val h = reduce64(shingles(j))
      var i = 0
      while (i < numPerm) {
        val v = mulAdd(as(i), h, bs(i))
        if (v < acc(i)) acc(i) = v
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** (a_i, b_i) pairs; a ∈ [1, p), b ∈ [0, p). Cached per (numPerm, seed). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()
  def params(numPerm: Int, seed: Long): (Array[Long], Array[Long]) =
    cache.computeIfAbsent((numPerm, seed), { _ =>
      val rnd = new java.util.SplittableRandom(seed)
      val as = Array.fill(numPerm)(rnd.nextLong(1L, Mersenne61.P))
      val bs = Array.fill(numPerm)(rnd.nextLong(0L, Mersenne61.P))
      (as, bs)
    })
}

/**
 * M2 — 64-bit SimHash fingerprint [Charikar02; Manku07 §2]. Word-unigram
 * tokens hashed with xxhash64(seed); each token adds ±1 per bit position;
 * final bit j is 1 iff counter_j > 0. Bag-of-words invariant: token order
 * never affects the fingerprint (tested), so paragraph-reordered pages
 * collide at Hamming 0.
 */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression with DelegatedUnaryCodegen {
  override protected def resultCast: String = "(long)(java.lang.Long)"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val utf8 = input.asInstanceOf[UTF8String]
    val bytes = utf8.getBytes
    val spans = Tok.tokenSpans(bytes, bytes.length)
    val counters = new Array[Int](64)
    var t = 0
    while (t < spans.length) {
      val h = Xxh.hashBytes(bytes, spans(t), spans(t + 1) - spans(t), seed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
        j += 1
      }
      t += 2
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (counters(j) > 0) fp |= (1L << j); j += 1 }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * V1 — exact Jaccard over two distinct-sorted long arrays (S1's
 * postcondition) via linear merge-intersect; |I| / |A|+|B|-|I| as double.
 * Matches `size(array_intersect(a,b)) / size(array_union(a,b))` on distinct
 * inputs (tested) but is O(|A|+|B|) with no hash-set allocation.
 * Both empty ⇒ null.
 */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with DelegatedBinaryCodegen {
  override protected def resultCast: String = "(double)(java.lang.Double)"
  override protected def resultNullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_sorted"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) null else java.lang.Double.valueOf(inter.toDouble / union.toDouble)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/**
 * Cosine similarity of two float vectors (ANN ops, SURVEY brief "similarity
 * search"). Accumulates in double, sequential order — bit-compatible with
 * DuckDB's list_* pattern on the same floats. Zero-norm ⇒ null.
 */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with DelegatedBinaryCodegen {
  override protected def resultCast: String = "(double)(java.lang.Double)"
  override protected def resultNullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
    if (a.length != b.length) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / math.sqrt(na * nb))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/**
 * Random-hyperplane LSH signature for embedding vectors [Charikar02 §3]:
 * bit b of the result is the sign of Σ_i x_i · r_{b,i}, where r_{b,i} ∈ {±1}
 * is derived from xxhash64(seed, b·2^32 + i) — no hyperplane matrix is ever
 * materialized or broadcast, so the expression is a pure per-row function
 * at any dimensionality. Used to bucket vectors for approximate
 * nearest-neighbor search (cosine LSH).
 */
case class EmbedSimHash(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression with DelegatedUnaryCodegen {
  require(bits >= 1 && bits <= 64)
  override protected def resultCast: String = "(long)(java.lang.Long)"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "embed_simhash"

  // Rademacher signs cached per dimensionality (deterministic from the
  // hash, so a racy re-init across local task threads is benign).
  @transient private var signs: Array[Array[Double]] = _
  private def signsFor(dim: Int): Array[Array[Double]] = {
    if (signs == null || (signs.length > 0 && signs(0).length != dim)) {
      signs = Array.tabulate(bits, dim)((b, i) =>
        if ((Xxh.hashLong((b.toLong << 32) | i.toLong, seed) & 1L) == 1L) 1.0 else -1.0)
    }
    signs
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
    val sg = signsFor(v.length)
    var fp = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      val row = sg(b)
      var i = 0
      while (i < v.length) { s += v(i) * row(i); i += 1 }
      if (s > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(newChild: Expression): EmbedSimHash =
    copy(child = newChild)
}

/**
 * E1 as a Catalyst expression: html binary → extracted text (see
 * graft.extract.HtmlExtract for the frozen spec + golden pins).
 */
case class HtmlToText(child: Expression)
    extends UnaryExpression with DelegatedUnaryCodegen {
  override protected def resultCast: String = "(org.apache.spark.unsafe.types.UTF8String)"
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "html_to_text"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.extract.HtmlExtract.text(input.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(newChild: Expression): HtmlToText =
    copy(child = newChild)
}
