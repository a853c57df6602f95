package graft.operators

import graft.{DedupConfig, SparkSuite}
import graft.sources.PagesGen

class ExactSubstrSpec extends SparkSuite {
  import spark.implicits._
  private val cfg = DedupConfig.test

  test("rollingHashes: equal windows hash equal, shifted content aligns") {
    val s = ("x" * 30 + "commonrun-commonrun-commonrun!" + "y" * 30)
      .getBytes("UTF-8")
    val t = ("z" * 7 + "commonrun-commonrun-commonrun!" + "w" * 50)
      .getBytes("UTF-8")
    val hs = ExactSubstr.rollingHashes(s, 10)
    val ht = ExactSubstr.rollingHashes(t, 10)
    // window starting at the shared run must hash identically in both
    assert(hs(30) === ht(7))
    assert(hs.length === s.length - 9)
  }

  test("winnowPositions: deterministic, content-defined, covers every window") {
    val rnd = new java.util.SplittableRandom(5)
    val hs = Array.fill(200)(rnd.nextLong())
    val w = 10
    val sel = ExactSubstr.winnowPositions(hs, w)
    assert(sel.toSeq === ExactSubstr.winnowPositions(hs, w).toSeq)
    // every window of w consecutive positions contains a selected position
    (0 to hs.length - w).foreach { start =>
      assert(sel.exists(p => p >= start && p < start + w), s"window at $start uncovered")
    }
    // winnowing guarantee: same suffix of hashes selects same positions (shifted)
    val shifted = hs.drop(37)
    val selShift = ExactSubstr.winnowPositions(shifted, w).map(_ + 37).toSet
    val inRange = sel.filter(_ >= 37 + w).toSet // away from the boundary window
    assert(inRange.subsetOf(selShift))
  }

  test("matchedRun verifies and extends to the maximal run") {
    val a = "AAAA-THE-COMMON-RUN-HERE-BBBB".getBytes("UTF-8")
    val b = "CC-THE-COMMON-RUN-HERE-DDDDDD".getBytes("UTF-8")
    // witness inside the common run, L=5
    val oa = a.indexOfSlice("COMMON".getBytes("UTF-8"))
    val ob = b.indexOfSlice("COMMON".getBytes("UTF-8"))
    val len = ExactSubstr.matchedRun(a, oa, b, ob, 5)
    assert(len === "-THE-COMMON-RUN-HERE-".length)
    assert(ExactSubstr.matchedRun(a, 0, b, 0, 5) === 0) // mismatching witness
  }

  test("gram route finds planted splices >= gramLen + winnowW - 1 bytes") {
    val docs = PagesGen.docs(spark, 500, cfg).toDF()
    val truth = PagesGen.truthPairsLocal(500, cfg)
      .filter(_.kind == "substr").map(p => (p.a, p.b)).toSet
    assert(truth.nonEmpty)
    val found = ExactSubstr.verifyExtend(
      ExactSubstr.candidates(ExactSubstr.gramIndex(docs, cfg), cfg), docs, cfg)
      .collect().map(p => (p.a, p.b)).toSet
    val recall = (found intersect truth).size.toDouble / truth.size
    assert(recall >= 0.99, s"recall=$recall missing=${truth diff found}")
    // every reported run really is >= gramLen (exactness)
    ExactSubstr.verifyExtend(
      ExactSubstr.candidates(ExactSubstr.gramIndex(docs, cfg), cfg), docs, cfg)
      .collect().foreach(p => assert(p.match_len >= cfg.gramLen))
  }

  test("shard route finds co-partitioned repeats >= gramLen") {
    // single pinned shard ⇒ every pair is co-partitioned
    val oneShard = cfg.copy(substrShards = 1)
    val docs = PagesGen.docs(spark, 500, cfg).toDF()
    val truth = PagesGen.truthPairsLocal(500, cfg)
      .filter(_.kind == "substr").map(p => (p.a, p.b)).toSet
    val found = ExactSubstr.shardRepeats(docs, oneShard)
      .collect().map(p => (p.a, p.b)).toSet
    val recall = (found intersect truth).size.toDouble / truth.size
    assert(recall >= 0.99, s"recall=$recall missing=${truth diff found}")
  }

  test("shard route output is independent of input parallelism") {
    val docs = PagesGen.docs(spark, 400, cfg).toDF()
    val a = ExactSubstr.shardRepeats(docs.repartition(3), cfg)
      .collect().map(p => (p.a, p.b, p.match_len)).toSet
    val b = ExactSubstr.shardRepeats(docs.repartition(17), cfg)
      .collect().map(p => (p.a, p.b, p.match_len)).toSet
    assert(a === b)
  }

  test("suffixArray: prefix doubling matches a reference comparator sort") {
    def referenceSa(buf: Array[Byte]): Array[Int] =
      (0 until buf.length).sortWith { (x, y) =>
        var i = x; var j = y
        while (i < buf.length && j < buf.length && buf(i) == buf(j)) { i += 1; j += 1 }
        if (i == buf.length) j < buf.length || x > y // shorter first; equal impossible
        else if (j == buf.length) false
        else (buf(i) & 0xff) < (buf(j) & 0xff)
      }.toArray
    val rnd = new java.util.SplittableRandom(7)
    val cases = Seq(
      Array.emptyByteArray,
      "a".getBytes("UTF-8"),
      "banana".getBytes("UTF-8"),
      "aaaaaaaaaaaaaaaa".getBytes("UTF-8"), // adversarial long repeat
      ("ab" * 50).getBytes("UTF-8"),
      Array.fill(500)(rnd.nextInt(4).toByte), // small alphabet, many repeats
      Array.fill(300)(rnd.nextInt(256).toByte))
    cases.foreach { buf =>
      assert(ExactSubstr.suffixArray(buf).toSeq === referenceSa(buf).toSeq,
        s"mismatch on ${buf.take(20).mkString(",")} (len ${buf.length})")
    }
  }

  test("MaxGroup cap is counted, never silent: adversarial boilerplate fixture") {
    // >MaxGroup (1000) docs all sharing one long run, forced into ONE shard:
    // the cap must suppress pairs AND count every suppressed cross-doc pair
    val run = "Z" * (cfg.gramLen + 10)
    val docsSeq = (0L until 1200L).map(i => (i, s"doc$i $run tail$i"))
    val docs = docsSeq.toDF("doc_id", "text")
    val acc = spark.sparkContext.longAccumulator("dropped")
    val found = ExactSubstr.shardRepeats(docs, cfg.copy(substrShards = 1,
      substrMinFrac = 0.0), None, Some(acc)).count()
    // the cap suppressed work (unique doc pairs emitted < the full clique)
    // AND counted it (suppressed candidate entry-pairs, analogous to
    // Lsh.saltedDropEstimate's per-band candidate accounting)
    assert(found < 1200L * 1199 / 2, "cap must actually truncate the clique")
    assert(acc.value > 0, "cap must record dropped candidate pairs")
  }

  test("pairListMaxClique stars sub-saltMaxBucket cliques: linear pairs, " +
       "clusters preserved, drops counted") {
    // 200-doc clique sharing one run — BELOW saltMaxBucket (1000) but above
    // pairListMaxClique (64): the r2 code emitted all C(200,2)=19900 pairs
    // (the 18.9M-pair blowup at 960k); now it must emit linear stars that
    // keep the clique connected, and count the suppressed pairs.
    val run = "Q" * (cfg.gramLen + 30)
    val docs = (0L until 200L).map(i => (i, s"doc$i $run tail$i"))
      .toDF("doc_id", "text")
    val acc = spark.sparkContext.longAccumulator("dropped")
    val found = ExactSubstr.shardRepeats(docs, cfg.copy(substrMinFrac = 0.0),
      Some(1), Some(acc)).collect().map(p => (p.a, p.b)).toSet
    info(s"clique of 200 -> ${found.size} pairs (all-pairs would be 19900)")
    // the big clique group emits ONE doc-keyed hub star (199 spokes);
    // residual pairs come from disjoint sub-cap SA subgroups (the shared
    // "tail<digit>" prefixes of this fixture) which all-pairs by design —
    // bounded by #groups × cap, never by C(cliqueSize, 2)
    assert(found.size < 4000, s"expected ~linear pair count, got ${found.size}")
    assert(found.count(_._1 == 0L) === 199, "hub star must span the clique")
    assert(acc.value > 15000, "suppressed clique pairs must be counted")
    // connectivity: union-find over found pairs -> ONE cluster of all 200
    val parent = scala.collection.mutable.Map((0L until 200L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    found.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert((0L until 200L).map(find).toSet.size === 1, "star cap must preserve the cluster")
    // the star path must stay deterministic across within-shard row order
    // (hub keyed on min doc_id, not SA-entry arrival)
    val reFound = ExactSubstr.shardRepeats(docs.repartition(7), cfg.copy(substrMinFrac = 0.0),
      Some(1), None).collect().map(p => (p.a, p.b)).toSet
    assert(reFound === found)
  }

  test("star spokes respect substrMinFrac per pair; chain fallback keeps members connected") {
    // 100 short docs + 3 long docs all share a 150-byte run R. With
    // frac=0.5: (short,short) and (short,long) pairs are TRUE dups
    // (threshold 0.5*~160 < 150); (long,long) pairs are NOT (0.5*~2150 >
    // 150). The clique (103 > pairListMaxClique) goes through the star
    // discipline, whose edges must (a) all pass the per-pair filter and
    // (b) still connect every doc — including the longs, whose hub edge to
    // a short passes even when their mutual pairs are correctly absent.
    val run = "R" * 150
    val shorts = (0L until 100L).map(i => (i, s"d$i $run"))
    // long tails must be mutually dissimilar (distinct repeated unit per
    // doc) or the longs WOULD be true dups of each other via their tails
    val longs = (100L until 103L).map(i => (i, run + " " + (s"x$i" * 700)))
    val docs = (shorts ++ longs).toDF("doc_id", "text")
    val strict = cfg.copy(substrMinFrac = 0.5)
    val found = ExactSubstr.shardRepeats(docs, strict, Some(1), None)
      .collect().map(p => (p.a, p.b, p.match_len))
    val lens = (shorts ++ longs).map { case (i, t) => i -> t.getBytes("UTF-8").length }.toMap
    // (a) every emitted pair genuinely passes both criteria
    found.foreach { case (a, b, l) =>
      assert(l >= strict.gramLen)
      assert(l >= 0.5 * math.min(lens(a), lens(b)),
        s"pair ($a,$b,$l) violates substrMinFrac — the r2 star bug")
      assert(!(a >= 100 && b >= 100), s"(long,long) pair ($a,$b) must be filtered out")
    }
    // (b) all 103 docs stay in one connected component
    val parent = scala.collection.mutable.Map((0L until 103L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    found.foreach { case (a, b, _) => parent(find(a)) = find(b) }
    assert((0L until 103L).map(find).toSet.size === 1,
      "every member with a true pair must stay connected")
  }

  test("sortRecords: primitive sort-dedupe matches a reference sort") {
    val rnd = new java.util.SplittableRandom(11)
    val m = 500
    val recs = new Array[Long](2 * m)
    (0 until m).foreach { i =>
      recs(2 * i) = rnd.nextLong(0, 40) // few distinct keys -> many dups
      recs(2 * i + 1) = rnd.nextLong(0, 1000)
    }
    val expect = (0 until m).map(i => (recs(2 * i), recs(2 * i + 1)))
      .sortBy(_._1)
    ExactSubstr.sortRecords(recs, m)
    val got = (0 until m).map(i => (recs(2 * i), recs(2 * i + 1)))
    assert(got.map(_._1) === expect.map(_._1))
    // values travel with their keys (multiset per key preserved)
    assert(got.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap ===
      expect.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap)
  }

  test("shardsFor scales with corpus bytes, floored at the config value") {
    assert(ExactSubstr.shardsFor(0L, cfg) === cfg.substrShards)
    assert(ExactSubstr.shardsFor(1L, cfg) === cfg.substrShards)
    val big = 100L * ExactSubstr.TargetShardBytes
    assert(ExactSubstr.shardsFor(big, cfg) === 100)
    assert(ExactSubstr.shardsFor(big + 1, cfg) === 101)
  }

  test("combined family is the union with max run length") {
    val docs = PagesGen.docs(spark, 300, cfg).toDF()
    val all = ExactSubstr.substrDupPairs(docs, cfg)
      .as[(Long, Long, Int)].collect()
    all.foreach { case (a, b, l) => assert(a < b); assert(l >= cfg.gramLen) }
  }
}
