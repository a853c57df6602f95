package graft.operators

import graft.{DedupConfig, SparkSuite}
import graft.functions.Fns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pair-recall gate (SURVEY.md §5.1 layer 2, BASELINE.json:2 "dup-pair
 * recall >= 0.99"): the LSH pipeline must reproduce the brute-force
 * exact-Jaccard pair set on the driver corpus at the pinned test config.
 * Truth is computed in-Spark with builtins only (independent of the custom
 * JaccardSorted expression).
 */
class PipelineRecallSpec extends SparkSuite {
  private val cfg = DedupConfig.test
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def brutePairs: DataFrame = {
    val sh = docs.select(col("doc_id"),
      Fns.shingleHashes(col("text"), cfg).as("s"))
    val a = sh.select(col("doc_id").as("a"), col("s").as("sa"))
    val b = sh.select(col("doc_id").as("b"), col("s").as("sb"))
    a.crossJoin(b).where(col("a") < col("b"))
      .withColumn("jaccard",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))))
      .where(col("jaccard") >= cfg.jaccardThreshold)
      .select("a", "b", "jaccard")
  }

  test("LSH pipeline reproduces brute-force pair set exactly (recall = 1.0)") {
    val truth = brutePairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Lsh.minhashDupPairs(docs, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    val recall = (found intersect truth).size.toDouble / truth.size
    assert(recall >= 0.99, s"recall=$recall missing=${truth diff found}")
    // exact verification ⇒ no false positives either
    assert(found === truth, s"extra=${found diff truth}")
  }

  test("clusters are permutation-invariant: shuffled input, same assignment") {
    val pairs = Lsh.minhashDupPairs(docs, cfg)
    val base = ConnectedComponents.assign(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shuffled = ConnectedComponents.assign(
      pairs.orderBy(rand(42)).repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base === shuffled)
  }
}
