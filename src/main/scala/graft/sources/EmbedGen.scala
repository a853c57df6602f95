package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic synthetic embeddings with PLANTED near-neighbor clusters —
 * the ANN-quality fixture (SURVEY.md §5.2 companion to PagesGen; stands in
 * for a real embedding model's output, which the driver's gaussian
 * `embeddings.parquet` cannot: on an isotropic gaussian corpus every
 * neighbor is borderline and LSH recall is structurally uninformative).
 *
 * Construction: vectors come in clusters of `clusterSize`; each cluster has
 * a unit base direction (seeded gaussian) and each member is the base plus
 * per-member gaussian noise of norm ≈ `eps`, so the expected in-cluster
 * cosine is ≈ 1/(1+eps²) (eps=0.25 → ≈0.94) while cross-cluster cosines
 * concentrate near 0 (±1/√dim). Ground truth: a vector's true top-k
 * neighbors (k < clusterSize) are exactly its cluster mates.
 *
 * Determinism contract (same as PagesGen): every row is a pure function of
 * (seed, id) — per-row SplittableRandom, never per-partition state — so the
 * same (n, seed) yields a byte-identical table at any parallelism.
 */
object EmbedGen {

  final case class Embed(vec_id: Long, embedding: Array[Float])

  private def rng(seed: Long, id: Long, stream: Int): java.util.SplittableRandom =
    new java.util.SplittableRandom(seed ^ (id * 0x9E3779B97F4A7C15L) ^ (stream * 0xC2B2AE3D27D4EB4FL))

  private def gaussian(r: java.util.SplittableRandom, dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      // Box-Muller from two uniforms (SplittableRandom has no nextGaussian
      // pre-17 shape guarantees; keep the transform pinned for determinism)
      val u1 = math.max(r.nextDouble(), 1e-12)
      val u2 = r.nextDouble()
      v(i) = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
      i += 1
    }
    v
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0
    v.foreach(x => n += x * x)
    val inv = 1.0 / math.max(math.sqrt(n), 1e-12)
    v.map(_ * inv)
  }

  /** The vector for (seed, id): cluster base direction + eps-norm noise. */
  def vectorFor(seed: Long, id: Long, dim: Int, clusterSize: Int, eps: Double): Array[Float] = {
    val base = normalize(gaussian(rng(seed, id / clusterSize, 0), dim))
    val noise = gaussian(rng(seed, id, 1), dim)
    val scale = eps / math.sqrt(dim.toDouble)
    Array.tabulate(dim)(i => (base(i) + noise(i) * scale).toFloat)
  }

  /** Planted corpus of `n` vectors in clusters of `clusterSize`. */
  def vectors(spark: SparkSession, n: Int, dim: Int = 32, clusterSize: Int = 8,
              eps: Double = 0.25, seed: Long = 0x5EAC15DL): Dataset[Embed] = {
    import spark.implicits._
    spark.range(n.toLong).map(id => Embed(id, vectorFor(seed, id, dim, clusterSize, eps)))
  }

  /** Cluster of a vector — the ground-truth neighbor relation. */
  def clusterOf(id: Long, clusterSize: Int = 8): Long = id / clusterSize
}
