package graft.operators

import graft.{DedupConfig, SparkSuite}
import graft.functions.Fns
import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.{SparseVector, Vectors}
import org.apache.spark.sql.functions._

/**
 * SURVEY.md §5 layer 5 — independent oracle: Spark MLlib's own MinHashLSH
 * (different permutation family, same theory) must agree with our pipeline
 * on which pairs are near-duplicates. Sanity cross-check, not exactness:
 * both engines threshold the SAME exact Jaccard, so the verified pair sets
 * must coincide; only the candidate routes differ.
 */
class MllibCrossCheckSpec extends SparkSuite {
  import spark.implicits._
  private val cfg = DedupConfig.test

  test("MLlib MinHashLSH similarity join agrees with our verified pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ours = Lsh.minhashDupPairs(docs, cfg)
      .select("a", "b").as[(Long, Long)].collect().toSet

    // shingle-set -> sparse binary vector over a hashed feature space
    val dim = 1 << 20
    val vecs = Lsh.shingled(docs, cfg)
      .where(size(col("shingles")) > 0)
      .as[(Long, Array[Long])]
      .map { case (id, sh) =>
        val idx = sh.map(h => ((h % dim) + dim) % dim).map(_.toInt).distinct.sorted
        (id, Vectors.sparse(dim, idx, Array.fill(idx.length)(1.0)))
      }.toDF("doc_id", "features")

    val model = new MinHashLSH().setNumHashTables(16).setSeed(7L)
      .setInputCol("features").setOutputCol("hashes").fit(vecs)
    val theirs = model
      .approxSimilarityJoin(vecs, vecs, 1.0 - cfg.jaccardThreshold, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .where(col("a") < col("b"))
      .as[(Long, Long)].collect().toSet

    // MLlib's join is also candidate-based (can miss), so compare both ways
    // with high overlap instead of strict equality
    val inter = (ours intersect theirs).size.toDouble
    assert(ours.nonEmpty && theirs.nonEmpty)
    assert(inter / ours.size >= 0.95, s"ours=${ours.size} theirs=${theirs.size} inter=$inter")
    assert(inter / theirs.size >= 0.95, s"ours=${ours.size} theirs=${theirs.size} inter=$inter")
  }
}
