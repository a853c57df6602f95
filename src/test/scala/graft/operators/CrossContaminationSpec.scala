package graft.operators

import graft.{DedupConfig, SparkSuite}

/** `ExactSubstr.crossContamination` — cross-corpus EXACT-substring
  * decontamination ([Lee22] §4 train-test overlap; q43). Contract under
  * test: byte-verified maximal runs (sound), complete at the winnowing
  * guarantee, NO substrMinFrac relative filter (a short benchmark answer
  * inside a huge page is contamination), witness cap drops loudly.
  */
class CrossContaminationSpec extends SparkSuite {
  import spark.implicits._

  // guarantee = gramLen + winnowW - 1 = 14 bytes for readable fixtures
  private val cfg = DedupConfig.test.copy(gramLen = 10, winnowW = 5)

  private val run = "THE-BENCHMARK-ANSWER-SEQUENCE-IS-HERE" // 37 bytes >= 14

  private def collectPairs(out: org.apache.spark.sql.DataFrame) =
    out.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap

  test("finds verbatim overlaps with the maximal run; no frac filter; sub-gramLen runs stay out") {
    // the spliced run is ~5% of the corpus doc — far below substrMinFrac's
    // 20%, which must NOT apply to contamination
    val filler = (1 to 60).map(i => f"corpusfiller$i%03d").mkString(" ")
    val corpus = Seq(
      (1L, filler.substring(0, 400) + "<" + run + ">" + filler.substring(400)),
      (3L, "completely unrelated corpus text with no benchmark overlap at all"),
      (5L, "corpus-prefix[" + run + "]corpus-suffix"),
      (7L, "shares only EIGHT-by with the benchmark side") // 8 bytes < gramLen
    ).toDF("doc_id", "text")
    val bench = Seq(
      (2L, "bench doc embedding {" + run + "} plus trailing context"),
      (4L, "another clean benchmark question with nothing shared EIGHT-by.")
    ).toDF("doc_id", "text")
    val got = collectPairs(ExactSubstr.crossContamination(corpus, bench, cfg))
    assert(got.keySet === Set((1L, 2L), (5L, 2L)))
    // maximal run is exactly the planted sequence (delimiters differ)
    assert(got((1L, 2L)) === run.length)
    assert(got((5L, 2L)) === run.length)
  }

  test("minMatch raises the reporting floor; <=0 means the winnowing guarantee") {
    val corpus = Seq((1L, "aaaa[" + run + "]bbbb")).toDF("doc_id", "text")
    val bench = Seq((2L, "cccc{" + run + "}dddd")).toDF("doc_id", "text")
    assert(ExactSubstr.crossContamination(corpus, bench, cfg,
      minMatch = run.length + 1).count() === 0L)
    assert(collectPairs(ExactSubstr.crossContamination(corpus, bench, cfg,
      minMatch = run.length)) === Map((1L, 2L) -> run.length))
  }

  test("witness cap drops are counted loudly; kept witnesses still verify") {
    // one shared run across MANY benchmark docs -> its grams exceed the cap
    val corpus = Seq((100L, "xx(" + run + ")yy")).toDF("doc_id", "text")
    val bench = (0L until 10L)
      .map(i => (i, s"bench$i " * 3 + "<" + run + ">" + s" tail$i"))
      .toDF("doc_id", "text")
    val acc = spark.sparkContext.longAccumulator("droppedWitnesses")
    val got = ExactSubstr.crossContamination(corpus, bench, cfg,
      witnessCap = 2, droppedWitnesses = Some(acc))
    val pairs = collectPairs(got)
    assert(pairs.nonEmpty && pairs.values.forall(_ === run.length))
    // every kept witness is one of the deterministic minimal entries
    assert(pairs.keySet.forall { case (a, b) => a === 100L && b < 10L })
    assert(acc.value > 0L, "excess witnesses must be counted, not silent")
  }

  test("bounded witness accumulation == collect-then-slice on a mega-hot gram") {
    // r7 (VERDICT_r6 #5): the witness build keeps the cap smallest
    // (doc_id, off) per gram with buffers bounded at the cap EVERYWHERE
    // (the old collect_list buffered all witnesses before slicing). Pin
    // byte-identity of the aggregate against the unbounded reference on a
    // single-gram pathological benchmark: hundreds of docs sharing one run.
    import org.apache.spark.sql.functions._
    val cap = 3
    val hotBench = (0L until 200L)
      .map(i => (i, s"b$i<" + run + s">t$i"))
      .toDF("doc_id", "text")
    val grams = ExactSubstr.gramIndex(hotBench, cfg).toDF()
      .localCheckpoint()
    val bounded = udaf(new graft.functions.BoundedWitnesses(cap))
    val got = grams.groupBy("gram")
      .agg(bounded(col("doc_id"), col("off")).as("ws"))
      .select(col("gram"), col("ws"))
      .as[(Long, Seq[(Long, Int)])].collect().toMap
    val ref = grams.groupBy("gram")
      .agg(slice(array_sort(collect_list(struct(col("doc_id"), col("off")))),
                 1, cap).as("ws"))
      .as[(Long, Seq[(Long, Int)])].collect().toMap
    assert(got === ref)
    assert(got.values.exists(_.size == cap), "a hot gram must hit the cap")
    // and the operator output on the pathological fixture stays correct
    val corpus = Seq((999L, "xx(" + run + ")yy")).toDF("doc_id", "text")
    val pairs = collectPairs(
      ExactSubstr.crossContamination(corpus, hotBench, cfg, witnessCap = cap))
    assert(pairs.nonEmpty && pairs.values.forall(_ === run.length))
  }

  test("containment regime matches brute force (the q43 oracle shape)") {
    // corpus doc CONTAINS bench doc 2 verbatim; bench doc 4 contains
    // corpus doc 5; match_len = the shorter text's byte length
    val inner = "INNER-BENCH-DOC-SHARED-VERBATIM-ACROSS"
    val corpus = Seq(
      (1L, "lead-" + inner + "-trail plus enough corpus context here"),
      (5L, inner)
    ).toDF("doc_id", "text")
    val bench = Seq(
      (2L, inner),
      (4L, "head>" + inner + "<tail")
    ).toDF("doc_id", "text")
    val got = collectPairs(ExactSubstr.crossContamination(corpus, bench, cfg))
    assert(got === Map(
      (1L, 2L) -> inner.length,
      (1L, 4L) -> inner.length, // shared run via the common inner text
      (5L, 2L) -> inner.length,
      (5L, 4L) -> inner.length))
  }
}
