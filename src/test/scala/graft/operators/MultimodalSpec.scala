package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "img-bytes-aaaa".getBytes("UTF-8")),
    (2L, "img-bytes-bbbb".getBytes("UTF-8")),
    (3L, "img-bytes-aaaa".getBytes("UTF-8")), // exact copy of 1
    (4L, Array.emptyByteArray)
  ).toDF("doc_id", "media")

  test("mediaFeatures: deterministic stub decode, full metadata schema") {
    val f1 = Multimodal.mediaFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.mediaFeatures(media.repartition(3)).collect().sortBy(_.doc_id)
    assert(f1.toSeq === f2.toSeq)
    val byId = f1.map(m => m.doc_id -> m).toMap
    assert(byId(1L).n_bytes === 14)
    assert(byId(1L).phash === byId(3L).phash)          // same bytes, same phash
    assert(byId(1L).phash !== byId(2L).phash)
    assert(byId(1L).width >= 64 && byId(1L).height >= 64)
    assert(byId(4L).n_bytes === 0)
  }

  test("mediaExactDedup groups identical blobs without shuffling them") {
    val groups = Multimodal.mediaExactDedup(media)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(groups === Set((1L, 2L), (2L, 1L), (4L, 1L)))
  }

  test("mediaNearDupPairs finds identical phashes at hamming 0") {
    val pairs = Multimodal.mediaNearDupPairs(Multimodal.mediaFeatures(media), 0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 3L)))
  }

  test("mediaNearDupPairs block route equals brute crossJoin (exact by pigeonhole)") {
    // synthetic phash fixture: base hashes plus planted near-dups at
    // Hamming 1-3 and decoys far away
    val rnd = new java.util.SplittableRandom(11)
    val base = (0L until 60L).map(i => (i, rnd.nextLong()))
    val dups = base.take(20).zipWithIndex.map { case ((i, h), j) =>
      val flips = 1 + j % 3
      val flipped = (0 until flips).foldLeft(h)((x, k) => x ^ (1L << ((j * 7 + k * 13) % 64)))
      (1000L + i, flipped)
    }
    val features = (base ++ dups).map { case (id, h) =>
      Multimodal.MediaMeta(id, "image", 4L, 64, 64, h)
    }.toDS()
    val t = 3
    val fast = Multimodal.mediaNearDupPairs(features, t)
      .as[(Long, Long, Int)].collect().toSet
    val df = features.toDF().select(col("doc_id"), col("phash"))
    val brute = df.select(col("doc_id").as("a"), col("phash").as("pa"))
      .crossJoin(df.select(col("doc_id").as("b"), col("phash").as("pb")))
      .where(col("a") < col("b"))
      .withColumn("hamming", bit_count(col("pa") bitwiseXOR col("pb")).cast("int"))
      .where(col("hamming") <= t)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(brute.nonEmpty)
    assert(fast === brute)
    // and the plan must not contain a cartesian product
    val plan = Multimodal.mediaNearDupPairs(features, t)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"block route must not crossJoin:\n$plan")
  }
}
