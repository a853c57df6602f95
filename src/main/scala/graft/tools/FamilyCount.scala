package graft.tools
import graft.DedupConfig
import graft.operators.{ExactSubstr, Lsh}
import graft.run.DedupMain
import org.apache.spark.sql.SparkSession
object FamilyCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DedupConfig.test
    val docs = DedupMain.toDocs(spark.read.parquet("/tmp/graft_scale_corpus_960000")).localCheckpoint(false)
    println(s"MH=${Lsh.minhashDupPairs(docs, cfg).count()}")
    println(s"SH=${Lsh.simhashDupPairs(docs, cfg).count()}")
    println(s"SUB=${ExactSubstr.substrDupPairs(docs, cfg).count()}")
    spark.stop()
  }
}
