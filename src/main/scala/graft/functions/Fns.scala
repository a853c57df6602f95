package graft.functions

import graft.DedupConfig
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.{Column, SparkSession}

/** Column-level façade over the custom Catalyst expressions — the public
  * function surface of the engine (plus SQL registration for `expr`/SQL
  * callers). Everything here stays inside Catalyst: no Scala UDF wrapping,
  * no encoder round-trips. */
object Fns {

  def shingleHashes(text: Column, cfg: DedupConfig): Column =
    column(ShingleHashes(expression(text), cfg.shingleUnit, cfg.k, cfg.seed))

  def shingleHashes(text: Column, unit: String, k: Int, seed: Long): Column =
    column(ShingleHashes(expression(text), unit, k, seed))

  def minhashSig(shingles: Column, cfg: DedupConfig): Column =
    column(MinHashSig(expression(shingles), cfg.numPerm, cfg.seed))

  def simhash64(text: Column, cfg: DedupConfig): Column =
    column(SimHash64(expression(text), cfg.seed))

  def jaccardSorted(a: Column, b: Column): Column =
    column(JaccardSorted(expression(a), expression(b)))

  def ngramStats(text: Column, n: Int, seed: Long = Xxh.SparkDefaultSeed): Column =
    column(NgramStats(expression(text), n, seed))

  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))

  def embedSimHash(vec: Column, bits: Int, seed: Long): Column =
    column(EmbedSimHash(expression(vec), bits, seed))

  def htmlToText(html: Column): Column =
    column(HtmlToText(expression(html)))

  /** Register SQL-callable forms (literal args) in the session's function
    * registry; idempotent. Example: `SELECT jaccard_sorted(a, b)`. */
  def register(spark: SparkSession, cfg: DedupConfig = DedupConfig.test): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "shingle_hashes", es => ShingleHashes(es.head, cfg.shingleUnit, cfg.k, cfg.seed), "builtin")
    reg.createOrReplaceTempFunction(
      "minhash_sig", es => MinHashSig(es.head, cfg.numPerm, cfg.seed), "builtin")
    reg.createOrReplaceTempFunction(
      "simhash64", es => SimHash64(es.head, cfg.seed), "builtin")
    reg.createOrReplaceTempFunction(
      "jaccard_sorted", es => JaccardSorted(es(0), es(1)), "builtin")
    reg.createOrReplaceTempFunction(
      "cosine_sim", es => CosineSim(es(0), es(1)), "builtin")
    reg.createOrReplaceTempFunction(
      "html_to_text", es => HtmlToText(es.head), "builtin")
  }
}
