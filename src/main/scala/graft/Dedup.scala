package graft

import graft.operators.{ConnectedComponents, ExactSubstr, Lsh}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The user-facing façade: what a caller of the reference engine switches
 * to. Input is any DataFrame with (doc_id: Long, text: String) — use
 * `sources.Pages.withDocId` / `run.DedupMain.toDocs` to adapt the
 * canonical pages shape first.
 */
object Dedup {

  /** Family-tagged verified duplicate pairs (a, b, family). The docs table
    * (scan + possible E1 extraction) is materialized once and shared by all
    * three families — without this each family re-runs the scan/extract
    * chain, which dominates when text comes from html. */
  def dupPairs(docs: DataFrame, cfg: DedupConfig = DedupConfig.test): DataFrame = {
    val d = docs.localCheckpoint(false, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    Lsh.dupPairs(
      Lsh.minhashDupPairs(d, cfg),
      Lsh.simhashDupPairs(d, cfg),
      ExactSubstr.substrDupPairs(d, cfg))
  }

  /** Cluster table (doc_id, cluster_id, cluster_size, is_canonical) for
    * every doc that has at least one duplicate. */
  def clusters(docs: DataFrame, cfg: DedupConfig = DedupConfig.test): DataFrame =
    ConnectedComponents.clusters(
      ConnectedComponents.assign(dupPairs(docs, cfg).select("a", "b")))

  /** THE dedup operation: the input with non-canonical duplicates removed —
    * every cluster keeps its smallest doc_id; singletons pass through.
    * Anti-join keeps the doc table itself out of the clustering shuffles. */
  def dedupe(docs: DataFrame, cfg: DedupConfig = DedupConfig.test): DataFrame = {
    val drop = clusters(docs, cfg).where(!col("is_canonical")).select("doc_id")
    docs.join(drop, Seq("doc_id"), "left_anti")
  }
}
