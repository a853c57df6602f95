package graft.operators

import graft.DedupConfig
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Exact-substring dedup pass (SURVEY.md §2.7, ops X1–X4; [Lee22] ExactSubstr
 * re-architected for Spark):
 *
 *  - cross-shard route: winnowed gram index (X1, [Schleimer03]) →
 *    collision groups (X2) → byte-verify + maximal extension (X3).
 *    Winnowing selects in every window of `winnowW` consecutive gram-start
 *    positions the min-hash gram (rightmost tie-break) — a function of
 *    content only, so two copies of a run select the SAME grams regardless
 *    of their offsets; any exact repeat of ≥ gramLen + winnowW − 1 bytes is
 *    guaranteed to collide (App A.3). Index density ≈ 2/(w+1) ≈ 4%.
 *  - within-shard route: per-partition suffix array (X4) catches repeats
 *    of ≥ gramLen bytes between co-partitioned docs (shorter than the
 *    winnowing guarantee). Sandbox note: suffix sorting uses a direct
 *    comparator (shards here are ≤ a few MB); a production 256 MB shard
 *    would swap in SA-IS behind the same signature.
 *
 * Scale: only ~4% of corpus positions are indexed; the gram shuffle is
 * (hash, doc, offset) triples; verification joins fetch texts for candidate
 * pairs only (semi-join restriction).
 */
object ExactSubstr {

  final case class Gram(gram: Long, doc_id: Long, off: Int)
  final case class SubstrPair(a: Long, b: Long, match_len: Int)

  private final val B = 0x100000001B3L // odd 64-bit polynomial base (FNV prime)

  /** Rolling-hash values of every `len`-byte window. */
  private[operators] def rollingHashes(bytes: Array[Byte], len: Int): Array[Long] = {
    val n = bytes.length - len + 1
    if (n <= 0) return Array.emptyLongArray
    val out = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < len) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    out(0) = h
    var powL = 1L
    i = 0
    while (i < len - 1) { powL *= B; i += 1 }
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xffL) * powL) * B + (bytes(i + len - 1) & 0xffL)
      out(i) = h
      i += 1
    }
    out
  }

  /** Winnowing [Schleimer03]: positions of the minimal hash (rightmost on
    * ties) in every `w`-window of gram starts; O(n) monotonic deque. */
  private[graft] def winnowPositions(hashes: Array[Long], w: Int): Array[Int] = {
    val n = hashes.length
    if (n == 0) return Array.emptyIntArray
    if (n <= w) {
      // single (short) window: pick global min, rightmost tie
      var best = 0
      var i = 1
      while (i < n) {
        if (java.lang.Long.compareUnsigned(hashes(i), hashes(best)) <= 0) best = i
        i += 1
      }
      return Array(best)
    }
    val deque = new java.util.ArrayDeque[Integer]()
    val sel = new java.util.LinkedHashSet[Integer]()
    var i = 0
    while (i < n) {
      while (!deque.isEmpty &&
        java.lang.Long.compareUnsigned(hashes(deque.peekLast), hashes(i)) >= 0)
        deque.pollLast()
      deque.addLast(i)
      while (deque.peekFirst <= i - w) deque.pollFirst()
      if (i >= w - 1) sel.add(deque.peekFirst)
      i += 1
    }
    val out = new Array[Int](sel.size())
    val it = sel.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** X1 — winnowed gram index over (doc_id, text). */
  def gramIndex(docs: DataFrame, cfg: DedupConfig): Dataset[Gram] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (len, w) = (cfg.gramLen, cfg.winnowW)
    docs.select(col("doc_id"), col("text")).as[(Long, String)].flatMap { case (id, text) =>
      if (text == null) Iterator.empty
      else {
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val hs = rollingHashes(bytes, len)
        winnowPositions(hs, w).iterator.map(p => Gram(hs(p), id, p))
      }
    }
  }

  /** X2 — candidate doc pairs from gram collisions, with one deterministic
    * witness offset pair (minimal offsets) per (a, b).
    *
    * Hot-gram discipline (same contract as Lsh hot buckets): a gram shared
    * by more docs than saltMaxBucket — web boilerplate — would enumerate a
    * quadratic clique; such groups split into salt lanes (per-(doc,gram)
    * salt so multiple shared grams cross-link lanes) and each lane emits a
    * STAR to its minimal (doc, off) witness. */
  def candidates(grams: Dataset[Gram], cfg: DedupConfig): DataFrame = {
    val g = grams.toDF("gram", "doc_id", "off")
    val cap = math.max(1, cfg.saltMaxBucket)
    val hotGrams = g.groupBy("gram").count()
      .where(col("count") > cap)
      .select(col("gram"), ceil(col("count") / cap).cast("int").as("nsalt"))
    val salted = g.join(broadcast(hotGrams), Seq("gram"), "left")
      .withColumn("is_hot", col("nsalt").isNotNull)
      .withColumn("salt",
        when(col("nsalt").isNull, lit(0))
          .otherwise(pmod(xxhash64(col("doc_id"), col("gram")), col("nsalt")).cast("int")))
      .drop("nsalt")

    val cold = salted.where(!col("is_hot"))
    val coldPairs = cold.select(col("gram"), col("salt"), col("doc_id").as("a"), col("off").as("off_a"))
      .join(cold.select(col("gram"), col("salt"), col("doc_id").as("b"), col("off").as("off_b")),
            Seq("gram", "salt"))
      .where(col("a") < col("b"))
      .select("a", "b", "off_a", "off_b")

    val w = org.apache.spark.sql.expressions.Window.partitionBy("gram", "salt")
    val hotPairs = salted.where(col("is_hot"))
      .withColumn("hub", min(struct(col("doc_id"), col("off"))).over(w))
      .where(col("doc_id") =!= col("hub.doc_id"))
      .select(col("hub.doc_id").as("a"), col("doc_id").as("b"),
              col("hub.off").as("off_a"), col("off").as("off_b"))

    coldPairs.unionByName(hotPairs)
      .groupBy("a", "b")
      .agg(min(struct(col("off_a"), col("off_b"))).as("w"))
      .select(col("a"), col("b"), col("w.off_a").as("off_a"), col("w.off_b").as("off_b"))
  }

  /** X3 — fetch both texts, byte-verify the witness gram, extend left/right
    * to the maximal run; keep pairs with a run ≥ gramLen. */
  def verifyExtend(cands: DataFrame, docs: DataFrame, cfg: DedupConfig): Dataset[SubstrPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ta = docs.select(col("doc_id").as("a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("b"), col("text").as("text_b"))
    val L = cfg.gramLen
    val frac = cfg.substrMinFrac
    cands.join(ta, "a").join(tb, "b")
      .select(col("a"), col("b"), col("off_a"), col("off_b"), col("text_a"), col("text_b"))
      .as[(Long, Long, Int, Int, String, String)]
      .flatMap { case (a, b, oa, ob, sa, sb) =>
        val ba = sa.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val bb = sb.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val len = matchedRun(ba, oa, bb, ob, L)
        // absolute floor AND a fraction of the shorter doc: docs sharing
        // only a boilerplate run (cookie banner) are not duplicates
        if (len >= L && len >= frac * math.min(ba.length, bb.length))
          Iterator.single(SubstrPair(a, b, len))
        else Iterator.empty
      }
  }

  /** Length of the maximal common run around (oa, ob) if the L-byte witness
    * matches; 0 otherwise. */
  private[operators] def matchedRun(ba: Array[Byte], oa: Int, bb: Array[Byte], ob: Int, L: Int): Int = {
    if (oa + L > ba.length || ob + L > bb.length) return 0
    var i = 0
    while (i < L) {
      if (ba(oa + i) != bb(ob + i)) return 0
      i += 1
    }
    var lo = 0
    while (oa - lo - 1 >= 0 && ob - lo - 1 >= 0 && ba(oa - lo - 1) == bb(ob - lo - 1)) lo += 1
    var hi = 0
    while (oa + L + hi < ba.length && ob + L + hi < bb.length &&
      ba(oa + L + hi) == bb(ob + L + hi)) hi += 1
    lo + L + hi
  }

  /** X4 — within-shard repeats via a per-partition suffix array over the
    * concatenated shard bytes. Emits (a, b, match_len) for cross-doc
    * adjacent-suffix LCPs ≥ gramLen. */
  def shardRepeats(docs: DataFrame, cfg: DedupConfig): Dataset[SubstrPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val L = cfg.gramLen
    // Shard composition is pinned by (configHash): hash-repartition on
    // doc_id into cfg.substrShards shards, so "same config ⇒ same pairs"
    // holds at ANY parallelism (upstream partitioning must not leak into
    // which repeats this route can see — the N-vs-4N-executor invariant).
    docs.select(col("doc_id"), col("text"))
      .repartition(cfg.substrShards, col("doc_id"))
      .as[(Long, String)].mapPartitions { it =>
      val shard = it.filter(_._2 != null).toArray
      if (shard.length < 2) Iterator.empty
      else {
        val texts = shard.map(_._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val total = texts.map(_.length + 1).sum
        val buf = new Array[Byte](total)
        val docOf = new Array[Int](total)
        var pos = 0
        texts.zipWithIndex.foreach { case (t, d) =>
          System.arraycopy(t, 0, buf, pos, t.length)
          java.util.Arrays.fill(docOf, pos, pos + t.length, d)
          buf(pos + t.length) = 0 // sentinel between docs
          docOf(pos + t.length) = d
          pos += t.length + 1
        }
        val sa = (0 until total).toArray.map(Integer.valueOf)
        java.util.Arrays.sort(sa, (x: Integer, y: Integer) => compareSuffix(buf, x, y))
        val best = new scala.collection.mutable.HashMap[(Long, Long), Int]()
        // Group maximal runs of SA entries whose consecutive LCP >= L and
        // emit EVERY cross-doc pair in the group with its range-min LCP —
        // adjacent pairs alone miss (copy1, copy2) when a run is shared by
        // 3+ docs (the base sorts between its copies). Group size capped:
        // a pathological shard-wide boilerplate run would otherwise emit
        // O(g^2) pairs; the cap is logged via the metrics wrapper upstream.
        val MaxGroup = 1000
        val gDocs = new scala.collection.mutable.ArrayBuffer[Int]()
        val gLcps = new scala.collection.mutable.ArrayBuffer[Int]()
        def flush(): Unit = {
          var i = 0
          while (i < gDocs.length && i < MaxGroup) {
            var minL = Int.MaxValue
            var j = i + 1
            while (j < gDocs.length && j < MaxGroup) {
              minL = math.min(minL, gLcps(j - 1))
              val (da, db) = (gDocs(i), gDocs(j))
              if (da != db) {
                val key = (math.min(shard(da)._1, shard(db)._1),
                           math.max(shard(da)._1, shard(db)._1))
                if (minL > best.getOrElse(key, 0)) best(key) = minL
              }
              j += 1
            }
            i += 1
          }
          gDocs.clear(); gLcps.clear()
        }
        var i = 1
        gDocs += docOf(sa(0).intValue)
        while (i < total) {
          val p = sa(i - 1).intValue
          val q = sa(i).intValue
          val l = lcp(buf, p, q)
          if (l >= L) { gDocs += docOf(q); gLcps += l }
          else { flush(); gDocs += docOf(q) }
          i += 1
        }
        flush()
        // same dual criterion as the gram route: absolute floor AND a
        // fraction of the shorter doc
        val lenOf = shard.map(s => s._1 -> s._2.getBytes(java.nio.charset.StandardCharsets.UTF_8).length).toMap
        best.iterator.collect { case ((a, b), l)
          if l >= cfg.substrMinFrac * math.min(lenOf(a), lenOf(b)) =>
          SubstrPair(a, b, l)
        }
      }
    }
  }

  private def compareSuffix(buf: Array[Byte], x: Int, y: Int): Int = {
    var i = x; var j = y
    while (i < buf.length && j < buf.length) {
      val c = (buf(i) & 0xff) - (buf(j) & 0xff)
      if (c != 0) return c
      i += 1; j += 1
    }
    (buf.length - x) - (buf.length - y)
  }

  private def lcp(buf: Array[Byte], x: Int, y: Int): Int = {
    var l = 0
    while (x + l < buf.length && y + l < buf.length &&
      buf(x + l) == buf(y + l) && buf(x + l) != 0) l += 1
    l
  }

  /** Full substring family: union of the cross-shard gram route and the
    * within-shard suffix-array route; (a, b, match_len) with the max run. */
  def substrDupPairs(docs: DataFrame, cfg: DedupConfig): DataFrame = {
    val gramRoute = verifyExtend(candidates(gramIndex(docs, cfg), cfg), docs, cfg).toDF()
    val shardRoute = shardRepeats(docs, cfg).toDF()
    gramRoute.unionByName(shardRoute)
      .groupBy("a", "b")
      .agg(max("match_len").as("match_len"))
  }
}
