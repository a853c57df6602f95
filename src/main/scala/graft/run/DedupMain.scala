package graft.run

import graft.DedupConfig
import graft.functions.Fns
import graft.operators.{ConnectedComponents, ExactSubstr, Lsh}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * EP2 — the spark-submit pipeline entry (SURVEY.md §3, BASELINE.json:14):
 *
 *   spark-submit --master <cluster|local[N]> --class graft.run.DedupMain \
 *     app.jar <inputParquetOrTable> <outRoot> [k=3] [bands=32] ...
 *
 * Stages materialize to `<outRoot>/<stage>` via the Checkpoint resume gate:
 * a killed run restarted with the same config skips every completed stage;
 * any config change (different configHash) recomputes from the first
 * affected stage. Metrics and per-partition lineage append under
 * `<outRoot>/_metrics` / `_lineage`.
 *
 * Accepts either the canonical pages shape (url, warc_ts, html, text,
 * lang) — extracting text with E1 where null and deriving doc_id =
 * xxhash64(url) — or a documents shape (doc_id, text, lang).
 */
object DedupMain {

  def parseConfig(args: Seq[String]): DedupConfig =
    args.foldLeft(DedupConfig.test) { (c, a) =>
      a.split("=", 2) match {
        case Array("k", v)           => c.copy(k = v.toInt)
        case Array("numPerm", v)     => c.copy(numPerm = v.toInt)
        case Array("bands", v)       => c.copy(bands = v.toInt)
        case Array("rows", v)        => c.copy(rows = v.toInt)
        case Array("jaccard", v)     => c.copy(jaccardThreshold = v.toDouble)
        case Array("hamming", v)     => c.copy(hammingThreshold = v.toInt)
        case Array("gramLen", v)     => c.copy(gramLen = v.toInt)
        case Array("winnowW", v)     => c.copy(winnowW = v.toInt)
        case Array("saltMaxBucket", v) => c.copy(saltMaxBucket = v.toInt)
        case Array("seed", v)        => c.copy(seed = java.lang.Long.decode(v))
        case _ => sys.error(s"unknown config arg: $a")
      }
    }

  /** Normalize any accepted input shape to (doc_id, text, lang). */
  def toDocs(input: DataFrame): DataFrame = {
    val cols = input.columns.toSet
    if (cols.contains("url")) {
      // canonical pages: extract when text is null, stable id from url
      input.select(
        xxhash64(col("url")).as("doc_id"),
        coalesce(col("text"), Fns.htmlToText(col("html"))).as("text"),
        col("lang"))
    } else {
      input.select(col("doc_id"), col("text"), col("lang"))
    }
  }

  /** The full pipeline, stage-checkpointed under `root`. Returns clusters. */
  def run(spark: SparkSession, inputRef: String, root: String, cfg: DedupConfig,
          runId: String = java.util.UUID.randomUUID().toString): DataFrame = {
    def stage(name: String)(build: => DataFrame): DataFrame =
      Checkpoint.stage(spark, root, name, cfg, runId)(build)

    val docs = stage("docs") {
      toDocs(graft.sources.TableIO.read(spark, inputRef))
    }
    val shingled = stage("shingled") { Lsh.shingled(docs, cfg) }
    val signatures = stage("signatures") {
      Lsh.signatures(shingled, cfg)
        .join(Lsh.simhashes(docs, cfg), "doc_id")
    }
    val bandKeys = stage("band_keys") {
      val mh = Lsh.saltBandKeys(
        Lsh.minhashBandKeys(signatures.select("doc_id", "minhash"), cfg), cfg)
        .withColumn("family", lit("minhash"))
      val sh = Lsh.saltBandKeys(
        Lsh.simhashBandKeys(signatures.select("doc_id", "simhash"), cfg), cfg)
        .withColumn("family", lit("simhash"))
      mh.unionByName(sh)
    }
    val dupPairs = stage("dup_pairs") {
      def cands(family: String) =
        Lsh.candidatePairs(bandKeys.where(col("family") === family)
          .select("doc_id", "band", "key", "salt"))
      val mh = Lsh.verifyJaccard(cands("minhash"), shingled, cfg)
      val sh = Lsh.verifyHamming(cands("simhash"),
        signatures.select("doc_id", "simhash"), cfg)
      val sub = ExactSubstr.substrDupPairs(docs, cfg)
      Lsh.dupPairs(mh, sh, sub)
    }
    stage("clusters") {
      ConnectedComponents.clusters(
        ConnectedComponents.assign(dupPairs.select("a", "b")))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DedupMain <input> <outRoot> [k=..] [bands=..] ...")
    val (inputRef, root) = (args(0), args(1))
    val cfg = parseConfig(args.drop(2).toSeq)
    val builder = SparkSession.builder()
      .appName("graft-dedup")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // spark-submit injects spark.master; default to local[cores] otherwise
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(s"local[${Runtime.getRuntime.availableProcessors}]")
                   .config("spark.sql.shuffle.partitions",
                           (2 * Runtime.getRuntime.availableProcessors).toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val clusters = run(spark, inputRef, root, cfg)
    val nClusters = clusters.select("cluster_id").distinct().count()
    val nDocs = clusters.count()
    println(s"""{"configHash":"${cfg.configHash}","clustered_docs":$nDocs,"clusters":$nClusters,"out":"$root"}""")
    spark.stop()
  }
}
