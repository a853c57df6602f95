package graft.operators

import graft.DedupConfig
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

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
 *    winnowing guarantee).
 *
 * Scale: only ~4% of corpus positions are indexed; the gram shuffle is
 * (hash, doc, offset) triples; verification joins fetch texts for candidate
 * pairs only (semi-join restriction).
 *
 * Pair-enumeration discipline (both routes): duplicate CLIQUES — boilerplate
 * shared by many docs — are quadratic if enumerated. Groups with more than
 * `pairStarCap` distinct docs emit linear stars (+ two-sided SA-adjacent
 * chain fallbacks in X4) instead of all pairs; suppressed pairs are COUNTED
 * into the caller's accumulator (loud cap, never silent). Cluster output is
 * preserved whenever a member's star edge or either adjacent chain edge
 * passes the length filters (the edges carry exact pairwise run lengths —
 * range-min over the SA interval — so they pass exactly when the adjacent
 * suppressed pairs would have); a member all three of whose edges fail can
 * split off non-adjacent short partners — that residue is inside the
 * counted drop, never silent.
 */
object ExactSubstr {

  final case class Gram(gram: Long, doc_id: Long, off: Int)
  final case class SubstrPair(a: Long, b: Long, match_len: Int)

  private final val B = 0x100000001B3L // odd 64-bit polynomial base (FNV prime)

  /** Star threshold for substring-family pair enumeration: the output-volume
    * cap (pairListMaxClique), falling back to the task-size cap
    * (saltMaxBucket) and then to uncapped. Kept separate from saltMaxBucket
    * on purpose: the 960k corpus showed true-dup cliques BELOW saltMaxBucket
    * (≈750 docs/shard) whose C(n,2) enumeration dominated the whole family's
    * output (18.9M pairs) while being redundant for clustering. */
  private[graft] def pairStarCap(cfg: DedupConfig): Int =
    if (cfg.pairListMaxClique > 0) cfg.pairListMaxClique
    else if (cfg.saltMaxBucket > 0) cfg.saltMaxBucket
    else Int.MaxValue

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
    * Hot-gram discipline: a gram shared by more entries than `pairStarCap`
    * — web boilerplate — would enumerate a quadratic clique; such groups
    * split into salt lanes (per-(doc,gram) salt so multiple shared grams
    * cross-link lanes) and each lane emits a STAR to its minimal (doc, off)
    * witness. The candidate pairs this suppresses — exactly the ones that
    * are transitively connected through the lane hub — are counted into
    * `dropped` when given (a small EAGER census aggregation; the census is
    * computed once and shared with the salting broadcast). */
  def candidates(grams: Dataset[Gram], cfg: DedupConfig,
                 dropped: Option[LongAccumulator] = None): DataFrame = {
    val spark = grams.sparkSession
    import spark.implicits._
    val g = grams.toDF("gram", "doc_id", "off")
    val cap = math.max(1, pairStarCap(cfg))
    // Per hot gram of n entries in s lanes the star emits ~(n − s) of its
    // C(n,2) candidate entry-pairs; the remainder is the (estimated)
    // suppressed count — same accounting as Lsh.saltedDropEstimate. The
    // census rides the checkpoint lineage as a task-side accumulator update
    // (one row per hot gram), so it fills when the CALLER'S action
    // materializes the checkpoint — no eager driver-side census job
    // serialized ahead of the families' shared union action. localCheckpoint
    // materializes exactly once, so re-reads don't double-count (a rare
    // task retry can — it is an estimate, recorded as such).
    val censusRows = g.groupBy("gram").count()
      .where(col("count") > cap)
      .select(col("gram"), col("count"),
              ceil(col("count") / cap).cast("int").as("nsalt"))
      .as[(Long, Long, Int)]
    val counted = dropped match {
      case Some(acc) => censusRows.mapPartitions { it =>
        // double arithmetic: n·(n−1)/2 overflows Long for grams with more
        // than ~4.3e9 entries (real at the 10^12-doc target); doubles
        // degrade gracefully, same as Lsh.saltedDropEstimate
        it.map { case r @ (_, n, s) =>
          acc.add(math.max(0L, (n.toDouble * (n - 1) / 2 - (n - s)).toLong)); r
        }
      }
      case None => censusRows
    }
    val hotGrams = counted.toDF("gram", "count", "nsalt")
      .localCheckpoint(false, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val salted = g.join(broadcast(hotGrams.drop("count")), Seq("gram"), "left")
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

  /** Incremental X2 — new×all gram collision candidates for the day-append
    * path: every emitted pair involves ≥1 new doc, so no candidate is ever
    * produced twice across appends (the `Lsh.newVsAllListing`
    * discipline, carrying the gram witness offsets the byte-verify needs).
    * Hot grams (census over all entries, > pairStarCap) emit a star from
    * each NEW entry to the global-min (doc, off) witness plus a
    * hub-to-previous-hub chain edge — never the quadratic product. */
  def newVsAllGramCandidates(newGrams: DataFrame, oldGrams: DataFrame,
                             cfg: DedupConfig,
                             dropped: Option[LongAccumulator] = None): DataFrame = {
    val spark = newGrams.sparkSession
    import spark.implicits._
    val cap = math.max(1, pairStarCap(cfg))
    val gAll = newGrams.unionByName(oldGrams)
    val hotCounts = gAll.groupBy("gram").count().where(col("count") > cap)
    val hotBase = dropped match {
      case Some(acc) =>
        // loud-cap accounting (estimate): a hot gram with n entries, m of
        // them new, has ~m·(n−m) + C(m,2) candidate entry-pairs involving
        // a new entry; the star emits ~m spokes. Task-side update on the
        // checkpoint lineage — no eager census job.
        hotCounts
          .join(newGrams.groupBy("gram").agg(count(lit(1)).as("mnew")), Seq("gram"), "left")
          .select(col("gram"), col("count"), coalesce(col("mnew"), lit(0L)).as("mnew"))
          .as[(Long, Long, Long)]
          .mapPartitions { it =>
            it.map { case r @ (_, n, m) =>
              val cands = m.toDouble * (n - m) + m.toDouble * (m - 1) / 2
              acc.add(math.max(0L, (cands - m).toLong))
              r
            }
          }.toDF("gram", "count", "mnew")
      case None => hotCounts
    }
    val hot = hotBase.select("gram")
      .localCheckpoint(false, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // canonical (a < b) pair with the witness offsets on the right sides
    def canon(xd: org.apache.spark.sql.Column, xo: org.apache.spark.sql.Column,
              yd: org.apache.spark.sql.Column, yo: org.apache.spark.sql.Column) = Seq(
      least(xd, yd).as("a"), greatest(xd, yd).as("b"),
      when(xd < yd, xo).otherwise(yo).as("off_a"),
      when(xd < yd, yo).otherwise(xo).as("off_b"))
    val coldNew = newGrams.join(broadcast(hot), Seq("gram"), "left_anti")
    val coldAll = gAll.join(broadcast(hot), Seq("gram"), "left_anti")
    val coldPairs = coldNew
      .select(col("gram"), col("doc_id").as("xd"), col("off").as("xo"))
      .join(coldAll.select(col("gram"), col("doc_id").as("yd"), col("off").as("yo")),
            "gram")
      .where(col("xd") =!= col("yd"))
      .select(canon(col("xd"), col("xo"), col("yd"), col("yo")): _*)
    val hubAll = gAll.join(broadcast(hot), Seq("gram"))
      .groupBy("gram").agg(min(struct(col("doc_id"), col("off"))).as("h"))
    val hubOld = oldGrams.join(broadcast(hot), Seq("gram"))
      .groupBy("gram").agg(min(struct(col("doc_id"), col("off"))).as("ho"))
    val spokes = newGrams.join(broadcast(hot), Seq("gram"))
      .join(hubAll, "gram")
      .where(col("doc_id") =!= col("h.doc_id"))
      .select(canon(col("doc_id"), col("off"), col("h.doc_id"), col("h.off")): _*)
    val chain = hubAll.join(hubOld, "gram")
      .where(col("h.doc_id") =!= col("ho.doc_id"))
      .select(canon(col("h.doc_id"), col("h.off"), col("ho.doc_id"), col("ho.off")): _*)
    coldPairs.unionByName(spokes).unionByName(chain)
      .groupBy("a", "b")
      .agg(min(struct(col("off_a"), col("off_b"))).as("w"))
      .select(col("a"), col("b"), col("w.off_a").as("off_a"), col("w.off_b").as("off_b"))
  }

  /** Incremental substring family for a day-append, full-contract (runs ≥
    * gramLen, same as the batch family):
    *  - gram route: new×all winnowed-index join (exact for repeats ≥ the
    *    winnowing guarantee between new docs and the whole corpus);
    *  - suffix-array route: ONLY the shards containing ≥1 new doc are
    *    re-scanned. Shard assignment pmod(hash(doc_id), numShards) is a
    *    pure per-doc function, so a touched shard's suffix groups equal
    *    the from-scratch run's for that shard; the `is_new` flag drops
    *    old↔old pairs inside the task (already in the accumulated table).
    *    This closes the short-run window [gramLen, gramLen+winnowW−2] the
    *    gram route cannot guarantee across increments.
    *
    * `numShards` MUST be the shard count the accumulated pair table was
    * built at (callers pin it in the stage manifest and apply hysteresis:
    * when the corpus outgrows ~2× the per-shard byte target, they fall
    * back to a full rebuild at a fresh byte-scaled count — amortized
    * O(log growth) rebuilds, the classic doubling argument). Per-append
    * cost: touched shards ≈ S·(1−e^(−newDocs/S)) of the corpus — linear
    * co-partition work, never a quadratic candidate join. */
  def substrDupPairsIncremental(docsNew: DataFrame, docsOld: DataFrame,
                                cfg: DedupConfig, numShards: Int,
                                droppedPairs: Option[LongAccumulator] = None)
      : DataFrame = {
    val grNew = gramIndex(docsNew, cfg).toDF()
    val grOld = gramIndex(docsOld, cfg).toDF()
    val cands = newVsAllGramCandidates(grNew, grOld, cfg, droppedPairs)
    val allTexts = docsNew.select("doc_id", "text")
      .unionByName(docsOld.select("doc_id", "text"))
    val gramRoute = verifyExtend(cands, allTexts, cfg).toDF()
    // same hash family as repartition's HashPartitioning (Murmur3, seed 42)
    val shardOf = pmod(hash(col("doc_id")), lit(numShards))
    val touched = docsNew.select(shardOf.as("s")).distinct()
    val flagged = docsNew.select(col("doc_id"), col("text"), lit(true).as("is_new"))
      .unionByName(docsOld.select(col("doc_id"), col("text"), lit(false).as("is_new")))
    val scoped = flagged.join(broadcast(touched), shardOf === col("s"), "left_semi")
    // deliberately NO droppedPairs here: the capped-group accounting in
    // shardRepeats counts crossDocPairs() − emitted, and in a re-scanned
    // shard the old↔old pairs (suppressed by the is_new flag because they
    // are ALREADY STORED, not dropped) would massively overcount; the
    // gram-route census above carries the day's loud-cap estimate
    val shardRoute = shardRepeats(scoped, cfg, Some(numShards)).toDF()
    gramRoute.unionByName(shardRoute)
      .groupBy("a", "b")
      .agg(max("match_len").as("match_len"))
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

  /** X6 — cross-corpus exact-substring decontamination ([Lee22] §4's
    * train-test overlap check, the strongest decontamination predicate:
    * a verbatim byte run shared with a benchmark doc; q40's n-gram overlap
    * and q42's MinHash route are the fuzzy complements): corpus docs whose
    * text shares an exact run of ≥ `minMatch` bytes with any benchmark doc,
    * as (doc_id, bench_id, match_len) with the MAXIMAL verified run per
    * pair.
    *
    * Route: the winnowed gram index runs on BOTH corpora — winnowing is a
    * function of content alone, so a shared run selects the same grams on
    * both sides. Benchmark witnesses per gram are the deterministic minimal
    * (bench_id, off) entries, capped at `witnessCap` with every excess
    * COUNTED into the caller's accumulator (loud, never silent: a
    * boilerplate gram shared across the benchmark suite reports instead of
    * disappearing), and broadcast; corpus grams probe the broadcast
    * map-side, so the corpus never shuffles by gram. Texts are fetched for
    * candidate docs only (semi-restriction), the benchmark text table
    * broadcasts, and all witness offsets of a (doc, bench) pair byte-verify
    * inside one task against one fetched text pair.
    *
    * Contract: sound (every emitted run is byte-verified maximal) and
    * complete for runs ≥ gramLen + winnowW − 1 bytes (the winnowing
    * guarantee); a `minMatch` below the guarantee lowers only the
    * REPORTING floor — runs in [gramLen, guarantee) collide only when both
    * sides happen to select the same gram (the intra-corpus family closes
    * that band with the SA shard route, which has no cross-corpus
    * equivalent here because the benchmark side broadcasts instead of
    * co-sharding). `minMatch <= 0` means the guarantee itself. Deliberately
    * NO substrMinFrac relative filter (unlike the intra-corpus family): a
    * 200-byte benchmark answer inside a 100 KB page IS contamination.
    *
    * Scale: benchmark suites are 10^3–10^6 small docs against a 10^12-doc
    * corpus — the witness table and benchmark texts broadcast; corpus-side
    * work is the ~4%-density gram scan, a map-side broadcast probe, and
    * per-candidate text fetches. The drop count is an ESTIMATE with the
    * same caveat as `candidates`' census: it rides the witness subplan's
    * tasks, so a broadcast rebuild or task retry can double-count. */
  def crossContamination(corpus: DataFrame, bench: DataFrame, cfg: DedupConfig,
                         minMatch: Int = 0, witnessCap: Int = 8,
                         droppedWitnesses: Option[LongAccumulator] = None)
      : DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val floor = math.max(
      if (minMatch <= 0) cfg.gramLen + cfg.winnowW - 1 else minMatch,
      cfg.gramLen) // below gramLen the witness itself can't verify
    // Bounded top-k witness accumulation (r7, VERDICT_r6 #5): the cap
    // smallest (doc_id, off) per gram with buffers bounded at witnessCap
    // at every stage (map-side partials included) — output identical to
    // the slice(array_sort(collect_list(...))) it replaces, which
    // buffered EVERY witness of a gram before capping (a mega-hot
    // benchmark gram buffered unboundedly).
    val bounded = org.apache.spark.sql.functions.udaf(
      new graft.functions.BoundedWitnesses(witnessCap))
    val witnesses = gramIndex(bench.select("doc_id", "text"), cfg).toDF()
      .groupBy("gram")
      .agg(bounded(col("doc_id"), col("off")).as("ws"),
           count(lit(1)).as("n"))
    val witnessesCounted = droppedWitnesses match {
      case Some(acc) => witnesses.as[(Long, Seq[(Long, Int)], Long)]
        .mapPartitions { it =>
          it.map { case r @ (_, ws, n) => acc.add(math.max(0L, n - ws.size)); r }
        }.toDF("gram", "ws", "n")
        // the tuple-encoder round trip renames the struct fields to _1/_2;
        // restore (doc_id, off) so both branches feed the same downstream
        .select(col("gram"),
                transform(col("ws"), w => struct(
                  w.getField("_1").as("doc_id"),
                  w.getField("_2").as("off"))).as("ws"),
                col("n"))
      case None => witnesses
    }
    // one row per (corpus doc, bench doc) carrying ALL witness offset pairs:
    // the verify task tries each and keeps the maximal run, so the text
    // join ships each candidate text exactly once. Offsets per pair are
    // bounded by the doc's own selected grams (~4% of its bytes) ×
    // witnessCap.
    val cands = gramIndex(corpus.select("doc_id", "text"), cfg).toDF()
      .join(broadcast(witnessesCounted.select("gram", "ws")), Seq("gram"))
      .select(col("doc_id"), col("off").as("off_a"), explode(col("ws")).as("w"))
      .groupBy(col("doc_id"), col("w.doc_id").as("bench_id"))
      .agg(collect_set(struct(col("off_a"), col("w.off").as("off_b"))).as("offs"))
      // consumed by the text semi-restriction AND the payload join — without
      // this the whole corpus gram scan + witness build runs twice (caught
      // by a plan probe: the candidate subtree appeared twice pre-AQE)
      .localCheckpoint(false, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val ca = corpus.select(col("doc_id"), col("text").as("text_a"))
      .join(cands.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
    val cb = bench.select(col("doc_id").as("bench_id"), col("text").as("text_b"))
    cands.join(ca, "doc_id").join(broadcast(cb), "bench_id")
      .select(col("doc_id"), col("bench_id"), col("offs"),
              col("text_a"), col("text_b"))
      .as[(Long, Long, Seq[(Int, Int)], String, String)]
      .flatMap { case (a, b, offs, sa, sb) =>
        val ba = sa.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val bb = sb.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var best = 0
        offs.foreach { case (oa, ob) =>
          val len = matchedRun(ba, oa, bb, ob, cfg.gramLen)
          if (len > best) best = len
        }
        if (best >= floor) Iterator.single((a, b, best)) else Iterator.empty
      }.toDF("doc_id", "bench_id", "match_len")
  }

  /** Per-task shard size target. A shard of n bytes needs ~16n bytes of
    * int arrays for the suffix sort (sa/rank/rank2/tmp), so 16 MB shards
    * keep each task's working set ≈ 256 MB — safe with many concurrent
    * tasks per executor. */
  private[graft] val TargetShardBytes = 16L * 1024 * 1024

  /** Shard count for `shardRepeats`: a pure function of total corpus text
    * bytes (NOT of parallelism), so "same config + same input ⇒ same
    * shards ⇒ same pairs" holds at any cluster size, while shard size stays
    * bounded as the corpus grows (a pinned count would OOM at 100×).
    * Pipeline runners should record the chosen value (DedupMain writes a
    * metrics row) and fold it into the dup_pairs stage manifest so resume
    * detects a corpus-growth divergence. */
  def shardsFor(totalTextBytes: Long, cfg: DedupConfig): Int =
    math.max(cfg.substrShards,
      ((totalTextBytes + TargetShardBytes - 1) / TargetShardBytes).toInt)

  /** Total UTF-8 text bytes of a docs table — the `shardsFor` input. One
    * column-pruned scan; runners compute it once and reuse it. */
  def totalTextBytes(docs: DataFrame): Long =
    docs.agg(coalesce(sum(octet_length(col("text"))), lit(0L))).head().getLong(0)

  /** X4 — within-shard repeats via a per-partition suffix array over the
    * concatenated shard bytes. Emits (a, b, match_len) for cross-doc
    * suffix groups with LCP ≥ gramLen that also pass the substrMinFrac
    * length-fraction filter (applied EAGERLY, per pair, inside the shard —
    * so the star discipline below sees exactly the pairs that survive).
    *
    * `numShards`: None ⇒ byte-scaled via `shardsFor(totalTextBytes(docs))`
    * (ONE eager aggregation at build time) — the single source of truth for
    * shard composition across the facade, SparkEntry and DedupMain.
    *
    * Hot-group discipline (`pairStarCap`): an SA group shared by more
    * distinct docs than the cap emits, per member, its STAR edge to the
    * group's first entry (prefix-min LCP = the TRUE pairwise run length vs
    * the hub, by the range-min property) and, when the star edge fails the
    * length filters, its SA-ADJACENT chain edge (the longest run this
    * member shares with any group neighbor) as a connectivity fallback —
    * linear output, clusters preserved, suppressed pairs COUNTED into
    * `droppedPairs` (loud cap, never silent). */
  def shardRepeats(docs: DataFrame, cfg: DedupConfig,
                   numShards: Option[Int] = None,
                   droppedPairs: Option[LongAccumulator] = None)
      : Dataset[SubstrPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val L = cfg.gramLen
    val frac = cfg.substrMinFrac
    val starCap = pairStarCap(cfg)
    val shards = numShards.getOrElse(shardsFor(totalTextBytes(docs), cfg))
    // Shard composition is pinned by (configHash, input bytes): hash-
    // repartition on doc_id into `shards` shards, so "same config ⇒ same
    // pairs" holds at ANY parallelism (upstream partitioning must not leak
    // into which repeats this route can see — the N-vs-4N invariant).
    //
    // Optional `is_new` column (day-append route): when present, only
    // pairs involving ≥1 flagged doc are emitted — old↔old pairs of a
    // re-scanned shard are already in the accumulated pair table. Absent
    // ⇒ every doc counts as new (the batch semantics, unchanged).
    val flagged =
      if (docs.columns.contains("is_new"))
        docs.select(col("doc_id"), col("text"), col("is_new"))
      else docs.select(col("doc_id"), col("text"), lit(true).as("is_new"))
    flagged
      .repartition(shards, col("doc_id"))
      .as[(Long, String, Boolean)].mapPartitions { it =>
      val shard = it.filter(_._2 != null).toArray
      if (shard.length < 2) Iterator.empty
      else {
        val texts = shard.map(_._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var total = 0
        texts.foreach(t => total += t.length + 1)
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
        val sa = suffixArray(buf)
        // Pair accumulation is primitive end-to-end: records of
        // (key = packed doc-index pair, value = run length) interleaved in
        // one long array, sort-deduped at the end keeping the max run.
        // (A HashMap[(Long, Long), Int] here boxed one tuple per candidate
        // pair × 64+ concurrent shard tasks — measured GC-pressure class.)
        var recs = new Array[Long](2048)
        var nRecs = 0 // record count (2 longs each)
        // Record a cross-doc pair iff it passes BOTH length criteria —
        // the absolute floor and the fraction of the shorter doc (docs
        // sharing only a cookie banner are not duplicates). Filtering
        // EAGERLY (not after dedupe) makes the star discipline's
        // connectivity and drop accounting exact: an edge either exists
        // and was counted, or was dropped and was counted.
        def record(da: Int, db: Int, l: Int): Boolean = {
          if (da == db) return false
          val lo = math.min(da, db); val hi = math.max(da, db)
          if (!shard(lo)._3 && !shard(hi)._3) return false // old↔old (day-append)
          if (l < L || l < frac * math.min(texts(lo).length, texts(hi).length))
            return false
          if (2 * nRecs + 2 > recs.length) recs = java.util.Arrays.copyOf(recs, recs.length * 2)
          recs(2 * nRecs) = (lo.toLong << 32) | hi
          recs(2 * nRecs + 1) = l
          nRecs += 1
          true
        }
        // Group maximal runs of SA entries whose consecutive LCP >= L and
        // emit cross-doc pairs in the group with their range-min LCP —
        // adjacent pairs alone miss (copy1, copy2) when a run is shared by
        // 3+ docs (the base sorts between its copies).
        val gDocs = new scala.collection.mutable.ArrayBuffer[Int]()
        val gLcps = new scala.collection.mutable.ArrayBuffer[Int]()
        // cross-doc pair count of the whole group: C(m,2) − Σ_d C(c_d,2)
        def crossDocPairs(): Long = {
          val m = gDocs.length.toLong
          val byDoc = new scala.collection.mutable.HashMap[Int, Long]()
          var i = 0
          while (i < m) { byDoc(gDocs(i)) = byDoc.getOrElse(gDocs(i), 0L) + 1; i += 1 }
          m * (m - 1) / 2 - byDoc.valuesIterator.map(c => c * (c - 1) / 2).sum
        }
        def flush(): Unit = {
          val g = gDocs.length
          // distinct docs in the group decide the discipline (a clique of
          // docs is hot even when each contributes one SA entry)
          var nDocs = 0
          if (g > 0) {
            val seen = new scala.collection.mutable.HashSet[Int]()
            var i = 0
            while (i < g && nDocs <= starCap) {
              if (seen.add(gDocs(i))) nDocs += 1
              i += 1
            }
          }
          // star when the doc clique exceeds the cap, or when SA entries
          // (docs with the run repeated internally) would make the
          // all-pairs loop quadratic beyond ~C(4·cap, 2)
          if (nDocs > starCap || g > 4 * starCap) {
            // Hub = the (first, in SA order) entry of the group's MINIMAL
            // doc_id. A run longer than gramLen produces overlapping
            // groups at every trim level, all over the same doc set — a
            // doc-keyed hub collapses their stars to ONE star after the
            // sort-dedupe (a first-entry hub emitted a different star per
            // level: measured 16× pair inflation on a 200-doc clique with
            // a 130-byte run), and it is deterministic across within-shard
            // row order (doc_ids are unique; SA group membership is a
            // function of content only).
            var h = 0
            var i = 1
            while (i < g) {
              if (shard(gDocs(i))._1 < shard(gDocs(h))._1) h = i
              i += 1
            }
            var emitted = 0L
            // Star edges carry the TRUE pairwise run length vs the hub —
            // the range-min of the adjacent LCPs between the two entries
            // (scanned outward from h). When a member's hub edge fails the
            // length filters (e.g. a long hub doc), BOTH of its SA-adjacent
            // chain edges are tried as connectivity fallbacks (a one-sided
            // fallback can still isolate a member whose single neighbor is
            // same-doc or another long doc). Connectivity is thereby
            // preserved in every case where some adjacent edge passes; a
            // member whose star AND both chain edges all fail the filters
            // can still split off pairs it shares with non-adjacent short
            // members — such residual drops are part of the COUNTED
            // suppression below, never silent.
            //
            // Each SA-adjacent chain edge is attempted AT MOST ONCE per
            // group: consecutive members both failing their hub edge would
            // otherwise record edge (i−1, i) twice — same args, so the
            // second attempt can only double-count `emitted` (deflating the
            // loud-cap suppression below) or re-fail the same filters.
            val chainTried = new Array[Boolean](math.max(1, g - 1))
            def chainEdge(j: Int): Boolean =
              j >= 0 && j < g - 1 && !chainTried(j) && {
                chainTried(j) = true
                record(gDocs(j), gDocs(j + 1), gLcps(j))
              }
            var minL = Int.MaxValue
            i = h + 1
            while (i < g) {
              minL = math.min(minL, gLcps(i - 1))
              if (record(gDocs(h), gDocs(i), minL)) emitted += 1
              else {
                if (chainEdge(i - 1)) emitted += 1
                if (chainEdge(i)) emitted += 1
              }
              i += 1
            }
            minL = Int.MaxValue
            i = h - 1
            while (i >= 0) {
              minL = math.min(minL, gLcps(i))
              if (record(gDocs(h), gDocs(i), minL)) emitted += 1
              else {
                if (chainEdge(i)) emitted += 1
                if (chainEdge(i - 1)) emitted += 1
              }
              i -= 1
            }
            droppedPairs.foreach(_.add(math.max(0L, crossDocPairs() - emitted)))
          } else {
            var i = 0
            while (i < g) {
              var minL = Int.MaxValue
              var j = i + 1
              while (j < g) {
                minL = math.min(minL, gLcps(j - 1))
                record(gDocs(i), gDocs(j), minL)
                j += 1
              }
              i += 1
            }
          }
          gDocs.clear(); gLcps.clear()
        }
        var i = 1
        gDocs += docOf(sa(0))
        while (i < total) {
          val p = sa(i - 1)
          val q = sa(i)
          val l = lcp(buf, p, q)
          if (l >= L) { gDocs += docOf(q); gLcps += l }
          else { flush(); gDocs += docOf(q) }
          i += 1
        }
        flush()
        // sort-dedupe the primitive records: max run length per doc pair
        sortRecords(recs, nRecs)
        new Iterator[SubstrPair] {
          private var r = 0
          def hasNext: Boolean = r < nRecs
          def next(): SubstrPair = {
            val key = recs(2 * r)
            var best = recs(2 * r + 1)
            r += 1
            while (r < nRecs && recs(2 * r) == key) {
              if (recs(2 * r + 1) > best) best = recs(2 * r + 1)
              r += 1
            }
            val idA = shard((key >>> 32).toInt)._1
            val idB = shard((key & 0xffffffffL).toInt)._1
            SubstrPair(math.min(idA, idB), math.max(idA, idB), best.toInt)
          }
        }
      }
    }
  }

  /** In-place sort of `m` interleaved (key, value) long records by key
    * ascending — quicksort (median-of-three, smaller-side recursion,
    * insertion sort below 12) over primitive longs, zero allocation. */
  private[operators] def sortRecords(a: Array[Long], m: Int): Unit = {
    @inline def key(i: Int): Long = a(2 * i)
    def swap(i: Int, j: Int): Unit = {
      var t = a(2 * i); a(2 * i) = a(2 * j); a(2 * j) = t
      t = a(2 * i + 1); a(2 * i + 1) = a(2 * j + 1); a(2 * j + 1) = t
    }
    def sort(lo0: Int, hi0: Int): Unit = {
      var lo = lo0; var hi = hi0
      while (hi - lo > 12) {
        val mid = lo + (hi - lo) / 2
        if (key(mid) < key(lo)) swap(mid, lo)
        if (key(hi) < key(lo)) swap(hi, lo)
        if (key(hi) < key(mid)) swap(hi, mid)
        val p = key(mid)
        var i = lo; var j = hi
        while (i <= j) {
          while (key(i) < p) i += 1
          while (key(j) > p) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        if (j - lo < hi - i) { sort(lo, j); lo = i } else { sort(i, hi); hi = j }
      }
      var i = lo + 1
      while (i <= hi) {
        val k = a(2 * i); val v = a(2 * i + 1)
        var j = i - 1
        while (j >= lo && a(2 * j) > k) {
          a(2 * (j + 1)) = a(2 * j); a(2 * (j + 1) + 1) = a(2 * j + 1); j -= 1
        }
        a(2 * (j + 1)) = k; a(2 * (j + 1) + 1) = v
        i += 1
      }
    }
    if (m > 1) sort(0, m - 1)
  }

  /** Suffix array by prefix doubling with counting sorts [Manber-Myers]:
    * O(n log n) guaranteed (immune to long-repeat adversarial inputs that
    * blow up comparison sorts), primitive int arrays only (the previous
    * boxed-Integer comparator sort allocated O(n) objects per shard and
    * collapsed under GC pressure at 10^5+ docs). */
  private[operators] def suffixArray(s: Array[Byte]): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.emptyIntArray
    var sa = new Array[Int](n)
    var tmp = new Array[Int](n)
    var rank = new Array[Int](n)
    var rank2 = new Array[Int](n)
    val K = math.max(257, n + 1)
    val cnt = new Array[Int](K)

    // base pass: counting sort of positions by byte value
    var i = 0
    while (i < n) { rank(i) = s(i) & 0xff; i += 1 }
    java.util.Arrays.fill(cnt, 0, 257, 0)
    i = 0
    while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
    i = 1
    while (i < 257) { cnt(i) += cnt(i - 1); i += 1 }
    i = 0
    while (i < n) { sa(cnt(rank(i))) = i; cnt(rank(i)) += 1; i += 1 }

    var k = 1
    while (k < n) {
      // order by second key (rank of i+k, absent = smallest): suffixes with
      // i+k >= n first, then the rest in current sa order shifted by k
      var p = 0
      i = n - k
      while (i < n) { tmp(p) = i; p += 1; i += 1 }
      i = 0
      while (i < n) { if (sa(i) >= k) { tmp(p) = sa(i) - k; p += 1 }; i += 1 }
      // stable counting sort of tmp by first key (current rank)
      java.util.Arrays.fill(cnt, 0)
      i = 0
      while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
      i = 1
      while (i < K) { cnt(i) += cnt(i - 1); i += 1 }
      i = 0
      while (i < n) { val v = tmp(i); sa(cnt(rank(v))) = v; cnt(rank(v)) += 1; i += 1 }
      // recompute ranks for length 2k
      def rankAt(x: Int): Int = if (x + k < n) rank(x + k) else -1
      rank2(sa(0)) = 0
      i = 1
      var maxRank = 0
      while (i < n) {
        val same = rank(sa(i)) == rank(sa(i - 1)) && rankAt(sa(i)) == rankAt(sa(i - 1))
        maxRank = rank2(sa(i - 1)) + (if (same) 0 else 1)
        rank2(sa(i)) = maxRank
        i += 1
      }
      val t = rank; rank = rank2; rank2 = t
      if (maxRank == n - 1) return sa
      k <<= 1
    }
    sa
  }

  private def lcp(buf: Array[Byte], x: Int, y: Int): Int = {
    var l = 0
    while (x + l < buf.length && y + l < buf.length &&
      buf(x + l) == buf(y + l) && buf(x + l) != 0) l += 1
    l
  }

  /** Full substring family: union of the cross-shard gram route and the
    * within-shard suffix-array route; (a, b, match_len) with the max run.
    * `numShards` None ⇒ byte-scaled sharding (see `shardRepeats`) — the
    * default for every caller (facade, SparkEntry, DedupMain) so all paths
    * produce the same pair set at the same configHash and corpus.
    * `droppedPairs` threads to BOTH routes' star caps (counted drops). */
  def substrDupPairs(docs: DataFrame, cfg: DedupConfig,
                     numShards: Option[Int] = None,
                     droppedPairs: Option[LongAccumulator] = None)
      : DataFrame = {
    // Deliberately NOT Lsh.spreadInput here (r7, measured): the family's
    // five consumers (byte census, gram index, two verify text joins,
    // shard route) are independent subtrees whose single-task scans
    // already overlap within one job, and the shard route repartitions by
    // doc_id itself — a shared spread+checkpoint measured 1.0 → 1.2 s on
    // the q21 shape (extra exchange + serialized materialization).
    val shards = numShards.getOrElse(shardsFor(totalTextBytes(docs), cfg))
    val gramRoute = verifyExtend(candidates(gramIndex(docs, cfg), cfg, droppedPairs), docs, cfg).toDF()
    val shardRoute = shardRepeats(docs, cfg, Some(shards), droppedPairs).toDF()
    gramRoute.unionByName(shardRoute)
      .groupBy("a", "b")
      .agg(max("match_len").as("match_len"))
  }
}
