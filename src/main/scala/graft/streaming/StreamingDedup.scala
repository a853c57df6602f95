package graft.streaming

import graft.DedupConfig
import graft.functions.Fns
import graft.operators.Lsh
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming mapping of the dedup pipeline (SURVEY.md §2.10):
 * incremental crawl batches stream through the SAME signature expressions,
 * and LSH buckets become keyed state — each (band, key) group remembers its
 * members (bounded by saltMaxBucket, the streaming form of hot-bucket
 * protection) and emits only the NEW candidate pairs each micro-batch.
 *
 * Invariant (tested): over any sequence of micro-batches, the union of
 * emitted candidate pairs equals the batch pipeline's candidate pairs on
 * the same corpus (modulo pairs suppressed by the state cap, which are
 * counted, never silent).
 */
object StreamingDedup {

  final case class BandKey(band: Int, key: Long, doc_id: Long)
  final case class CandPair(a: Long, b: Long, band: Int, key: Long)
  /** Bounded bucket membership, plus how many docs the cap suppressed. */
  final case class BucketState(members: List[Long], suppressed: Long)

  /** Band keys as a streaming-safe projection (same expressions as batch). */
  def bandKeys(docs: DataFrame, cfg: DedupConfig): Dataset[BandKey] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // no isNotNull filter: it would re-evaluate the sig chain per row
    // (see Lsh.signatures); posexplode drops null signatures for free
    val sigs = docs
      .select(col("doc_id"), Fns.minhashSig(Fns.shingleHashes(col("text"), cfg), cfg).as("minhash"))
    Lsh.minhashBandKeys(sigs, cfg)
      .select(col("band"), col("key"), col("doc_id")).as[BandKey]
  }

  /** Incremental candidate generation: flatMapGroupsWithState keyed by
    * (band, key); state = bucket members so far. */
  def candidatePairsStream(keys: Dataset[BandKey], cfg: DedupConfig): Dataset[CandPair] = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.groupByKey(k => (k.band, k.key))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, key), rows, state: GroupState[BucketState]) =>
          val prev = state.getOption.getOrElse(BucketState(Nil, 0L))
          val incoming = rows.map(_.doc_id).toSeq.distinct.filterNot(prev.members.contains)
          val cap = if (cfg.saltMaxBucket > 0) cfg.saltMaxBucket else Int.MaxValue
          val room = math.max(0, cap - prev.members.size)
          val admitted = incoming.take(room)
          val suppressed = prev.suppressed + (incoming.size - admitted.size)
          state.update(BucketState(admitted.toList ::: prev.members, suppressed))
          // new pairs: admitted × existing  ∪  admitted × admitted
          val existing = prev.members
          val newPairs = for {
            (n, i) <- admitted.zipWithIndex
            o <- existing.iterator ++ admitted.drop(i + 1).iterator
          } yield CandPair(math.min(n, o), math.max(n, o), band, key)
          newPairs.iterator
      }
  }

  /** Windowed event-time throughput rollup with late-data watermark:
    * docs/minute per lang (the streaming metrics table). */
  def windowedDocCounts(pages: DataFrame, watermark: String = "10 minutes",
                        window_ : String = "1 minute"): DataFrame =
    pages
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), window_), col("lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Session-window crawl-burst analytics (session gap per lang). */
  def sessionBursts(pages: DataFrame, gap: String = "5 minutes"): DataFrame =
    pages
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(session_window(col("warc_ts"), gap), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
}
