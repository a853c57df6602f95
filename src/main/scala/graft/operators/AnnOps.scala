package graft.operators

import graft.functions.Fns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (builder brief: ANN as a
 * first-class component). Two paths:
 *
 *  - `bruteTopK` / `bruteCosinePairs`: exact cosine via a broadcast
 *    cartesian product — the correctness baseline. Fine when one side fits
 *    in an executor (queries × corpus); never the 100 TB self-join path.
 *  - `lshTopK` / `lshCosinePairs`: the scale path — random-hyperplane LSH
 *    bucketing [Charikar02]: vectors only meet inside a (table, key)
 *    bucket, so the join is an equi-join that shuffles by bucket (AQE
 *    skew-split applies), O(n·tables) rows instead of O(n²) pairs.
 *    Candidate generation joins 16-byte id rows ONLY; embeddings are
 *    fetched per candidate pair afterwards — the vectors never ride
 *    through the bucket shuffle.
 */
object AnnOps {

  /**
   * Exact threshold pairs (a, b, cos), a < b. Two phases:
   *  1. the CosineSim predicate runs inside the O(n²) broadcast-join
   *     condition (codegen-delegated — builtin zip_with/aggregate HOFs
   *     would fall back to interpreted eval with a per-pair allocation,
   *     measured ~5× slower) and emits candidate ids only;
   *  2. a tiny second join re-attaches vectors and emits the exact cos
   *     for the survivors — bit-identical to the oracle's formula.
   */
  def bruteCosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val cand = a.crossJoin(broadcast(b))
      .where(col("a") < col("b") && Fns.cosineSim(col("ea"), col("eb")) >= threshold)
      .select("a", "b")
    withCosine(cand, emb).select("a", "b", "cos")
  }

  /** Exact top-k cosine neighbors: (vec_id, rank, neighbor_id, cos).
    * Ties broken by neighbor_id for full determinism. */
  def bruteTopK(emb: DataFrame, k: Int): DataFrame = {
    val a = emb.select(col("vec_id"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("eb"))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), col("neighbor_id"))
    a.crossJoin(broadcast(b))
      .where(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", Fns.cosineSim(col("ea"), col("eb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("rank").cast("long").as("rank"), col("neighbor_id"), col("cos"))
  }

  /** LSH band keys for embeddings: `tables` keys per vector, each from an
    * independent `bitsPerTable`-bit slice of a random-hyperplane signature.
    * Emits only (vec_id, band, key) — 20 bytes/row into the bucket shuffle. */
  def embedBandKeys(emb: DataFrame, tables: Int, bitsPerTable: Int, seed: Long): DataFrame = {
    require(tables * bitsPerTable <= 64)
    val sig = Fns.embedSimHash(col("embedding"), tables * bitsPerTable, seed)
    val entries = (0 until tables).map { t =>
      struct(lit(t).as("band"),
             shiftrightunsigned(col("sig"), t * bitsPerTable)
               .bitwiseAND(lit((1L << bitsPerTable) - 1)).as("key"))
    }
    emb.withColumn("sig", sig)
      .select(col("vec_id"), explode(array(entries: _*)).as("e"))
      .select(col("vec_id"), col("e.band").as("band"), col("e.key").as("key"))
  }

  /** Distinct candidate id pairs (a < b) from any-table bucket collisions. */
  def lshCandidatePairs(emb: DataFrame, tables: Int, bitsPerTable: Int, seed: Long): DataFrame = {
    val keys = embedBandKeys(emb, tables, bitsPerTable, seed)
    keys.select(col("band"), col("key"), col("vec_id").as("a"))
      .join(keys.select(col("band"), col("key"), col("vec_id").as("b")), Seq("band", "key"))
      .where(col("a") < col("b"))
      .select("a", "b")
      .distinct()
  }

  /** Fetch both embeddings for candidate id pairs and compute exact cosine. */
  private def withCosine(pairs: DataFrame, emb: DataFrame): DataFrame =
    pairs
      .join(emb.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
      .join(emb.select(col("vec_id").as("b"), col("embedding").as("eb")), "b")
      .withColumn("cos", Fns.cosineSim(col("ea"), col("eb")))

  /** Approximate top-k: bucket-collision candidates, exact cosine rank
    * within candidates. Same output shape as bruteTopK. */
  def lshTopK(emb: DataFrame, k: Int, tables: Int = 8, bitsPerTable: Int = 8,
              seed: Long = 0x5EAC15DL): DataFrame = {
    val cand = lshCandidatePairs(emb, tables, bitsPerTable, seed)
    // score once per unordered pair, then mirror for per-vector ranking
    val scored = withCosine(cand, emb).select("a", "b", "cos")
    val sym = scored.select(col("a").as("vec_id"), col("b").as("neighbor_id"), col("cos"))
      .unionByName(scored.select(col("b").as("vec_id"), col("a").as("neighbor_id"), col("cos")))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), col("neighbor_id"))
    sym.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id", "cos")
  }

  /** Embedding near-dup pairs at a cosine threshold via LSH buckets
    * (embedding-cosine near-dup op from the brief): (a, b, cos). */
  def cosineDupPairs(emb: DataFrame, threshold: Double, tables: Int = 8,
                     bitsPerTable: Int = 8, seed: Long = 0x5EAC15DL): DataFrame =
    withCosine(lshCandidatePairs(emb, tables, bitsPerTable, seed), emb)
      .where(col("cos") >= threshold)
      .select("a", "b", "cos")
}
