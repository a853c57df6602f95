package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Properties of `Lsh.newVsAllCandidatePairs` — the shared incremental
  * new×all bucket join behind the streaming bridge and DedupMain's
  * day-append path (SURVEY §2.10.2 J6). */
class NewVsAllSpec extends SparkSuite {
  import spark.implicits._

  /** Random (doc_id, key) band-key rows: `buckets` keys, 2–12 members. */
  private def keysFixture(seed: Long, buckets: Int): Seq[(Long, Long)] = {
    val rnd = new java.util.SplittableRandom(seed)
    for {
      k <- 0 until buckets
      n = 2 + rnd.nextInt(11)
      i <- 0 until n
    } yield (rnd.nextLong() & 0x7fffffffL, k.toLong)
  }

  test("union over increments == the batch cold listing; no pair emitted twice") {
    val rows = keysFixture(11L, 40).distinct
    // increments are DOC-granular (all of a doc's band keys arrive
    // together — the pipeline's contract); a row-granular split would let
    // a pair legitimately re-collide on a key whose rows straddle batches
    val docGroups = rows.map(_._1).distinct.grouped(
      (rows.map(_._1).distinct.size + 2) / 3).map(_.toSet).toSeq
    val incs = docGroups.map(g => rows.filter(r => g.contains(r._1)))
    var seen = Set.empty[(Long, Long)]
    var old = Seq.empty[(Long, Long)]
    incs.foreach { inc =>
      val newK = inc.toDF("doc_id", "key")
      val oldK = old.toDF("doc_id", "key")
      // pre-distinct cold listing carries NO duplicate rows on this
      // single-key-per-pair fixture: new↔old emitted from the new side
      // only, new↔new once via x < y (the 2×-transient fix)
      val raw = Lsh.newVsAllRawCandidates(newK, oldK, cap = 1000, None)
        .as[(Long, Long)].collect()
      assert(raw.length === raw.distinct.length,
        "pre-distinct new×all listing must not duplicate any pair row")
      val emitted = Lsh.newVsAllCandidatePairs(newK, oldK, cap = 1000)
        .as[(Long, Long)].collect().toSet
      assert(emitted === raw.toSet)
      assert((seen intersect emitted).isEmpty,
        "a pair must never be produced twice across increments")
      seen ++= emitted
      old ++= inc
    }
    val batch = Lsh.candidatePairs(
        rows.toDF("doc_id", "key").withColumn("salt", lit(0)))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(seen === batch,
      s"extra=${seen -- batch} missing=${batch -- seen}")
  }

  test("hot buckets emit hub stars + hub chain, never the quadratic product") {
    // one bucket of 100 members arriving in two increments of 50
    val first = (0L until 50L).map(i => (i, 7L))
    val second = (50L until 100L).map(i => (i, 7L))
    val cap = 10
    val e1 = Lsh.newVsAllCandidatePairs(
        first.toDF("doc_id", "key"), Seq.empty[(Long, Long)].toDF("doc_id", "key"),
        cap)
      .as[(Long, Long)].collect().toSet
    // increment 1: star to the global min (doc 0)
    assert(e1 === (1L until 50L).map(i => (0L, i)).toSet)
    val e2 = Lsh.newVsAllCandidatePairs(
        second.toDF("doc_id", "key"), first.toDF("doc_id", "key"), cap)
      .as[(Long, Long)].collect().toSet
    // increment 2: new members spoke to the (unchanged) hub; no old↔old
    assert(e2 === (50L until 100L).map(i => (0L, i)).toSet)
    // a new arrival that TAKES OVER the minimum chains to the old hub
    val taker = Seq((-5L, 7L))
    val e3 = Lsh.newVsAllCandidatePairs(
        taker.toDF("doc_id", "key"), (first ++ second).toDF("doc_id", "key"), cap)
      .as[(Long, Long)].collect().toSet
    assert(e3.contains((-5L, 0L)), "new hub must chain to the previous hub")
    assert(e3.size <= 2, s"hub takeover must stay linear, got ${e3.size} pairs")
  }
}
