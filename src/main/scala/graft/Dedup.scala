package graft

import graft.functions.Fns
import graft.operators.{ConnectedComponents, ExactSubstr, Lsh}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * The user-facing façade: what a caller of the reference engine switches
 * to. Input is any DataFrame with (doc_id: Long, text: String) — use
 * `sources.Pages.withDocId` / `run.DedupMain.toDocs` to adapt the
 * canonical pages shape first.
 */
object Dedup {

  /** Family-tagged verified duplicate pairs (a, b, family).
    *
    * Reuse discipline (mirrors DedupMain's staged pipeline, in block-cache
    * form): the docs table (scan + possible E1 extraction) is materialized
    * once; then ONE projection over it computes BOTH per-doc fingerprints —
    * shingles and simhash — into a single cached table that feeds banding
    * AND both verify joins. Splitting the families into independent
    * `minhashDupPairs`/`simhashDupPairs` calls (the pre-r3 shape) scanned
    * the cached docs and ran the text-processing pass once per family.
    *
    * This method is EAGER (one union action materializes both candidate
    * sets): the counts gate the candidate-doc semi-restriction of the
    * verify joins — the 100-TB discipline DedupMain's staged path runs —
    * so the heavy shingle arrays shuffle only for candidate docs. */
  def dupPairs(docs: DataFrame, cfg: DedupConfig = DedupConfig.test): DataFrame = {
    val d = docs.localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    val fp = d.select(col("doc_id"),
        Fns.shingleHashes(col("text"), cfg).as("shingles"),
        Fns.simhash64(col("text"), cfg).as("simhash"))
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    val shingled = fp.select("doc_id", "shingles")
    val simhashes = fp.select("doc_id", "simhash")
    val mhc = Lsh.candidatePairs(Lsh.saltBandKeys(
        Lsh.minhashBandKeys(Lsh.signatures(shingled, cfg), cfg), cfg))
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    val shc = Lsh.candidatePairs(Lsh.saltBandKeys(Lsh.simhashBandKeys(simhashes, cfg), cfg))
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    val sub = ExactSubstr.substrDupPairs(d, cfg)
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    // ONE union action materializes both candidate checkpoints AND the
    // (independent) substring family (three families' stages overlap
    // across the executor pool — serial counts measurably serialized them;
    // the substring suffix-array scan in particular has no dependency on
    // the banding chains and would otherwise idle behind this barrier),
    // and the counts gate the broadcast semi-restriction of the verify
    // joins: in the normal web regime (candidates ≪ corpus) the heavy
    // shingle arrays shuffle only for candidate docs instead of the whole
    // corpus — same discipline as DedupMain's staged path,
    // output-preserving by construction.
    val famCounts = mhc.select(lit("mh").as("fam"))
      .unionByName(shc.select(lit("sh").as("fam")))
      .unionByName(sub.select(lit("sub").as("fam")))
      .groupBy("fam").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (nMh, nSh) = (famCounts.getOrElse("mh", 0L), famCounts.getOrElse("sh", 0L))
    val mh = Lsh.verifyJaccard(
      mhc, Lsh.restrictToCandidateDocs(shingled, mhc, 2 * nMh), cfg)
    val sh = Lsh.verifyHamming(
      shc, Lsh.restrictToCandidateDocs(simhashes, shc, 2 * nSh), cfg)
    Lsh.dupPairs(mh, sh, sub)
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
