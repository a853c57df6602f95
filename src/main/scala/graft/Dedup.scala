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

  /** The lazy verified-pair plan plus the intermediate localCheckpoints
    * backing it (for block lifecycle). EAGER up to the candidate counts
    * (one union action materializes all three families — their stages
    * overlap across the executor pool; the counts gate the broadcast
    * semi-restriction of the verify joins); the final verify+union plan is
    * returned lazy so callers (and PlanSpec) can see/extend it. */
  private[graft] def dupPairsPlan(docs: DataFrame, cfg: DedupConfig)
      : (DataFrame, Seq[DataFrame]) = {
    // Job-phase labels (free: a thread-local property) — ScalingBench's
    // phase listener attributes wall and Σ-task-time per labeled job, the
    // instrument that pins WHICH term stops scaling 8→32 (VERDICT_r5 #3).
    val sc = docs.sparkSession.sparkContext
    // restore the CALLER's description afterwards instead of clobbering
    // it with null (ADVICE_r6: a caller-set label leaked away here)
    val prevDesc = sc.getLocalProperty("spark.job.description")
    // spread a single-file scan across the pool before checkpointing —
    // the fp fingerprint pass, gram index and byte census below otherwise
    // all run single-task (Lsh.spreadInput: partition-count-gated, output-
    // invariant)
    val d = Lsh.spreadInput(docs).localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    // ONE projection over the cached docs computes BOTH per-doc
    // fingerprints — shingles and simhash — into a single cached table
    // that feeds banding AND both verify joins. Splitting the families
    // into independent `minhashDupPairs`/`simhashDupPairs` calls (the
    // pre-r3 shape) ran the text-processing pass once per family.
    // NOTE: d/fp checkpoints are LAZY — jobs under this label are the
    // listing builders' eager sub-actions (substr byte/shard census, hot
    // censuses, checkpoint materializations they trigger)
    sc.setJobDescription("graft:listing-prep")
    val fp = d.select(col("doc_id"),
        Fns.shingleHashes(col("text"), cfg).as("shingles"),
        Fns.simhash64(col("text"), cfg).as("simhash"))
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    val shingled = fp.select("doc_id", "shingles")
    val simhashes = fp.select("doc_id", "simhash")
    // The substring family runs on its OWN action thread (guide §2.6,
    // VERDICT_r6 #3's overlap discipline extended upstream): its eager
    // byte census (shard sizing) + SA shard scan + gram census have no
    // dependency on the banding chains, and as serial driver actions they
    // idled the pool between the banding stages (measured: the facade's
    // pre-barrier leg ran totalTextBytes -> famCounts back-to-back; the
    // split overlaps the whole substr chain with the mh/sh listing
    // materialization — same outputs, the jobs just share the scheduler).
    // Job descriptions are thread-local, so the phase listener still
    // attributes each leg correctly. Concurrent first-materialization of
    // the shared lazy `d` checkpoint is block-manager-safe (one task
    // computes a partition, the other waits on the block lock).
    val subFut = scala.concurrent.Future {
      sc.setJobDescription("graft:listing-substr")
      val subC = ExactSubstr.substrDupPairs(d, cfg)
        .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
      val n = subC.count()
      sc.setJobDescription(null)
      (subC, n)
    }(scala.concurrent.ExecutionContext.global)
    // MinHash listing splits: cold candidates (downstream-verified) + hot
    // lanes resolved IN-TASK by the exact-Jaccard verified forest
    // (Lsh.jaccardLaneVerifiedPairs — clusters identical to the uncapped
    // enumeration, unlike the unverified hub stars this replaced)
    val (mhCands, mhHot) = Lsh.minhashListing(
      Lsh.saltBandKeys(
        Lsh.minhashBandKeys(Lsh.signatures(shingled, cfg), cfg), cfg),
      shingled, cfg)
    val mhc = mhCands.localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    val mhHotC = mhHot.localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    // SimHash pair listing runs the in-task verified-forest cap (see
    // Lsh.hammingCappedPairs — clusters identical to uncapped); with
    // salting disabled the join listing runs instead (task-memory bound)
    val shc = Lsh.simhashCandidatePairs(
        Lsh.saltBandKeys(
          Lsh.simhashBandKeys(simhashes, cfg, carryHash = true), cfg), cfg)
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    // ONE union action materializes the banding-side candidate checkpoints
    // while the substr thread runs (serial counts measurably serialized
    // the families). The counts gate the broadcast semi-restriction: in
    // the normal web regime (candidates ≪ corpus) the heavy shingle
    // arrays shuffle only for candidate docs — same discipline as
    // DedupMain's staged path, output-preserving.
    sc.setJobDescription("graft:listings-famcounts-barrier")
    val famCounts = mhc.select(lit("mh").as("fam"))
      .unionByName(mhHotC.select(lit("mhv").as("fam")))
      .unionByName(shc.select(lit("sh").as("fam")))
      .groupBy("fam").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sc.setJobDescription(prevDesc)
    val (sub, _) = scala.concurrent.Await.result(
      subFut, scala.concurrent.duration.Duration.Inf)
    val (nMh, nSh) = (famCounts.getOrElse("mh", 0L), famCounts.getOrElse("sh", 0L))
    // hot-lane edges are already exact-verified in-task — only the cold
    // candidates go through the verify join
    val mh = Lsh.verifyJaccard(
        mhc, Lsh.restrictToCandidateDocs(shingled, mhc, 2 * nMh), cfg)
      .unionByName(mhHotC)
    val sh = Lsh.verifyHamming(
      shc, Lsh.restrictToCandidateDocs(simhashes, shc, 2 * nSh), cfg)
    (Lsh.dupPairs(mh, sh, sub), Seq(d, fp, mhc, mhHotC, shc, sub))
  }

  /** Family-tagged verified duplicate pairs (a, b, family).
    *
    * EAGER: materializes the (small) pair table, then releases the five
    * intermediate block sets — repeated facade calls in one session (bench
    * loops, notebooks) otherwise pile up executor storage until eviction,
    * the block-pressure class the CC round lifecycle already fixed. The
    * returned checkpoint depends on nothing unpersisted here. */
  def dupPairs(docs: DataFrame, cfg: DedupConfig = DedupConfig.test): DataFrame = {
    val (pairs, intermediates) = dupPairsPlan(docs, cfg)
    val sc = docs.sparkSession.sparkContext
    val prevDesc = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription("graft:verify-union-ckpt")
    val out =
      try pairs.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      finally sc.setJobDescription(prevDesc)
    intermediates.foreach { df =>
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(blocking = false))
    }
    out
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

  /** Quality-aware dedup: every cluster keeps its HIGHEST-`score` member
    * (smallest doc_id on ties — fully deterministic); singletons pass
    * through untouched. This is the policy a training-data pipeline
    * actually wants — "keep the best copy", not "keep the first crawled".
    *
    * Scale shape: the score is evaluated only on CLUSTERED docs (the
    * assignment is a tiny table relative to the corpus), the winner per
    * cluster comes from one partial-aggregating `max(struct(score,
    * -doc_id))` groupBy — no per-cluster window, the same mega-cluster
    * skew rule as `ConnectedComponents.clusters` — and the corpus is
    * touched only by one final anti-join against the loser id list. */
  def dedupeBy(docs: DataFrame, score: org.apache.spark.sql.Column,
               cfg: DedupConfig = DedupConfig.test): DataFrame =
    keepBest(docs, ConnectedComponents.assign(dupPairs(docs, cfg).select("a", "b")), score)

  /** Keep, for every cluster of `assignment`, the member with the highest
    * `score` (smallest doc_id on ties); docs outside any cluster pass
    * through. The winner per cluster comes from one partial-aggregating
    * `max(struct(score, -doc_id))` groupBy — no per-cluster window, the
    * same mega-cluster skew rule as `ConnectedComponents.clusters` — and
    * the corpus is touched only by the final anti-join against the loser
    * id list. (doc_id = Long.MinValue would overflow the tie-break
    * negation; ids here are xxhash64/generator outputs, where MinValue has
    * probability 2^-64.) */
  private[graft] def keepBest(docs: DataFrame, assignment: DataFrame,
                              score: org.apache.spark.sql.Column): DataFrame = {
    val scored = docs.select(col("doc_id"), score.as("q"))
      .join(assignment, "doc_id")
    val winners = scored
      .groupBy("cluster_id")
      .agg(max(struct(col("q"), (-col("doc_id")).as("nd"))).as("w"))
      .select((-col("w.nd")).as("doc_id"))
    val losers = assignment.select("doc_id")
      .join(winners, Seq("doc_id"), "left_anti")
    docs.join(losers, Seq("doc_id"), "left_anti")
  }
}
