package graft.operators

import graft.functions.Fns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (builder brief: ANN as a
 * first-class component). Two paths:
 *
 *  - `bruteTopK`: exact cosine top-k via a broadcast cartesian product —
 *    the correctness baseline. Fine when one side fits in an executor
 *    (queries × corpus); never the 100 TB self-join path.
 *  - `lshTopK`: the scale path — random-hyperplane LSH bucketing
 *    [Charikar02]: vectors only meet inside a (table, key) bucket, so the
 *    join is an equi-join that shuffles by bucket (AQE skew-split applies),
 *    O(n·tables) rows instead of O(n²) pairs.
 */
object AnnOps {

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
    * independent `bitsPerTable`-bit slice of a random-hyperplane signature. */
  def embedBandKeys(emb: DataFrame, tables: Int, bitsPerTable: Int, seed: Long): DataFrame = {
    require(tables * bitsPerTable <= 64)
    val sig = Fns.embedSimHash(col("embedding"), tables * bitsPerTable, seed)
    val entries = (0 until tables).map { t =>
      struct(lit(t).as("band"),
             shiftrightunsigned(col("sig"), t * bitsPerTable)
               .bitwiseAND(lit((1L << bitsPerTable) - 1)).as("key"))
    }
    emb.withColumn("sig", sig)
      .select(col("vec_id"), col("embedding"), explode(array(entries: _*)).as("e"))
      .select(col("vec_id"), col("embedding"),
              col("e.band").as("band"), col("e.key").as("key"))
  }

  /** Approximate top-k: candidates = bucket collisions in any table, then
    * exact cosine rank within candidates. Same output shape as bruteTopK. */
  def lshTopK(emb: DataFrame, k: Int, tables: Int = 8, bitsPerTable: Int = 8,
              seed: Long = 0x5EAC15DL): DataFrame = {
    val keys = embedBandKeys(emb, tables, bitsPerTable, seed)
    val x = keys.select(col("band"), col("key"), col("vec_id"), col("embedding").as("ea"))
    val y = keys.select(col("band"), col("key"),
      col("vec_id").as("neighbor_id"), col("embedding").as("eb"))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), col("neighbor_id"))
    x.join(y, Seq("band", "key"))
      .where(col("vec_id") =!= col("neighbor_id"))
      .select("vec_id", "neighbor_id", "ea", "eb")
      .dropDuplicates("vec_id", "neighbor_id")
      .withColumn("cos", Fns.cosineSim(col("ea"), col("eb")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("vec_id"), col("rank").cast("long").as("rank"), col("neighbor_id"), col("cos"))
  }

  /** Embedding near-duplicate pairs at a cosine threshold via LSH buckets
    * (embedding-cosine near-dup op from the brief): (a, b, cos). */
  def cosineDupPairs(emb: DataFrame, threshold: Double, tables: Int = 8,
                     bitsPerTable: Int = 8, seed: Long = 0x5EAC15DL): DataFrame = {
    val keys = embedBandKeys(emb, tables, bitsPerTable, seed)
    val x = keys.select(col("band"), col("key"), col("vec_id").as("a"), col("embedding").as("ea"))
    val y = keys.select(col("band"), col("key"), col("vec_id").as("b"), col("embedding").as("eb"))
    x.join(y, Seq("band", "key"))
      .where(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("cos", Fns.cosineSim(col("ea"), col("eb")))
      .where(col("cos") >= threshold)
      .select("a", "b", "cos")
  }
}
