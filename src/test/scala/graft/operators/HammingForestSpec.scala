package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Properties of `Lsh.hammingCappedPairs` — the SimHash family's in-task
  * verified-forest pair listing (SURVEY §2.10.2 B4). The operator's whole
  * claim is "clusters identical to the uncapped clique enumeration"; these
  * tests pin each piece of that claim on randomized buckets. */
class HammingForestSpec extends SparkSuite {
  import spark.implicits._

  private val T = 3 // max Hamming
  private val Cap = 4

  /** Random bucket rows (key, salt, doc_id, simhash) with planted
    * Hamming-close groups: per bucket, a base fingerprint and members that
    * flip 0..5 random bits — some pairs verify (≤3), some don't. */
  private def fixture(seed: Long, buckets: Int, maxMembers: Int) = {
    val rnd = new java.util.SplittableRandom(seed)
    val rows = for {
      b <- 0 until buckets
      base = rnd.nextLong()
      n = 2 + rnd.nextInt(maxMembers - 1)
      i <- 0 until n
    } yield {
      var h = base
      val flips = rnd.nextInt(6)
      (0 until flips).foreach(_ => h ^= 1L << rnd.nextInt(64))
      (b.toLong, 0, b * 10000L + i, h)
    }
    rows.toDF("key", "salt", "doc_id", "simhash")
  }

  /** Local oracle: all verified pairs per bucket (exact Hamming ≤ T). */
  private def bruteVerified(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val rows = df.as[(Long, Int, Long, Long)].collect()
    (for {
      Seq(x, y) <- rows.groupBy(r => (r._1, r._2)).values.flatMap(_.toList.combinations(2))
      if java.lang.Long.bitCount(x._4 ^ y._4) <= T
    } yield (math.min(x._3, y._3), math.max(x._3, y._3))).toSet
  }

  private def components(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).map(x => x -> find(x)).toMap
  }

  test("capped buckets emit only VERIFIED edges; small buckets the exact all-pairs listing") {
    val df = fixture(101L, buckets = 20, maxMembers = 9)
    val out = Lsh.hammingCappedPairs(df, Cap, "simhash", T)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val verified = bruteVerified(df)
    val sizes = df.groupBy("key", "salt").count()
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._3).toMap
    out.foreach { case (a, b) =>
      val bucket = a / 10000L
      if (sizes(bucket) > Cap)
        assert(verified.contains((a, b)),
          s"capped bucket $bucket emitted an UNVERIFIED edge ($a,$b) — " +
            "the exact failure mode that corrupted clusters under starring")
    }
    // small buckets: the full candidate listing, nothing dropped
    val smallPairs = df.as[(Long, Int, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).filter(_._2.length <= Cap).values
      .flatMap(_.map(_._3).sorted.toList.combinations(2).map(s => (s(0), s(1)))).toSet
    assert(smallPairs.subsetOf(out), "small buckets must keep the exact all-pairs listing")
  }

  test("forest ∪ small-bucket verify has the SAME connectivity as the uncapped clique") {
    val df = fixture(202L, buckets = 30, maxMembers = 12)
    val verified = bruteVerified(df)
    // downstream semantics: emitted candidates pass through exact verify
    val emitted = Lsh.hammingCappedPairs(df, Cap, "simhash", T)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val emittedVerified = emitted.filter(verified.contains)
    assert(components(emittedVerified) === components(verified),
      "capped listing must preserve the verified subgraph's components exactly")
  }

  test("deterministic at any parallelism (the N-vs-4N invariant)") {
    val df = fixture(303L, buckets = 25, maxMembers = 10)
    val a = Lsh.hammingCappedPairs(df.repartition(3), Cap, "simhash", T)
      .orderBy("a", "b").as[(Long, Long, Long)].collect().toSeq
    val b = Lsh.hammingCappedPairs(df.repartition(17), Cap, "simhash", T)
      .orderBy("a", "b").as[(Long, Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("null-text docs neither bucket nor crash the simhash family") {
    // SimHash64 is null-safe → null fingerprints; they must be filtered
    // before banding (they would otherwise collide on per-combo constant
    // keys AND null-crash the typed in-task forest)
    val cfg = graft.DedupConfig.test
    val text = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text + " tail"), (3L, null), (4L, null))
      .toDF("doc_id", "text")
    val out = Lsh.simhashDupPairs(docs, cfg)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)),
      "near-identical pair found; null-text docs excluded without error")
  }

  test("suppressed-pair accounting is exact: passes − forest edges, per capped bucket") {
    val df = fixture(404L, buckets = 15, maxMembers = 10)
    val acc = spark.sparkContext.longAccumulator("suppressed")
    val out = Lsh.hammingCappedPairs(df, Cap, "simhash", T, Some(acc))
    out.count() // materialize → accumulator fills
    val verified = bruteVerified(df)
    val sizes = df.as[(Long, Int, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.length).toMap
    // per capped bucket: verified pairs − spanning edges (= comps' n−1 sum)
    val expected = sizes.filter(_._2 > Cap).keys.toList.map { bk =>
      val bucketVerified = verified.filter(p => p._1 / 10000L == bk._1)
      val comps = components(bucketVerified)
      bucketVerified.size.toLong -
        (comps.size - comps.values.toSet.size) // edges in a spanning forest
    }.sum
    assert(acc.value === expected,
      s"suppressed=${acc.value} expected=$expected — the loud cap must count exactly")
  }
}
