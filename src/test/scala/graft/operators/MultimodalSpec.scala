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
}
