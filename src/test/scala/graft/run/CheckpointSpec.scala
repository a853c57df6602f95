package graft.run

import graft.{DedupConfig, SparkSuite}
import graft.sources.PagesGen
import org.apache.spark.sql.functions._

/** K1-K3 kill-and-resume semantics (SURVEY.md §2.9, M4). */
class CheckpointSpec extends SparkSuite {
  import spark.implicits._
  private val cfg = DedupConfig.test

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-ckpt").toString

  test("resume gate: matching configHash skips recomputation") {
    val root = tmpRoot()
    val evals = spark.sparkContext.longAccumulator("evals")
    def build = PagesGen.docs(spark, 50, cfg).toDF()
      .map { r => evals.add(1); r.getLong(0) }.toDF("doc_id")
    val first = Checkpoint.stage(spark, root, "s1", cfg, "run1")(build)
    assert(first.count() === 50)
    val evalsAfterFirst = evals.value.longValue
    assert(evalsAfterFirst >= 50)
    val second = Checkpoint.stage(spark, root, "s1", cfg, "run2")(build)
    assert(second.count() === 50)
    assert(evals.value.longValue === evalsAfterFirst, "stage must not recompute")
  }

  test("config change invalidates the stage") {
    val root = tmpRoot()
    val evals = spark.sparkContext.longAccumulator("evals2")
    def build = PagesGen.docs(spark, 20, cfg).toDF()
      .map { r => evals.add(1); r.getLong(0) }.toDF("doc_id")
    Checkpoint.stage(spark, root, "s1", cfg, "run1")(build)
    val v1 = evals.value.longValue
    Checkpoint.stage(spark, root, "s1", cfg.copy(k = 5), "run2")(build)
    assert(evals.value.longValue > v1, "different configHash must recompute")
  }

  test("metrics and lineage tables record every stage, tagging resumes") {
    val root = tmpRoot()
    def build = PagesGen.docs(spark, 20, cfg).toDF()
    Checkpoint.stage(spark, root, "sA", cfg, "r1")(build)
    Checkpoint.stage(spark, root, "sA", cfg, "r2")(build) // resumed
    val m = Metrics.read(spark, root).orderBy("ts").collect()
    assert(m.length === 2)
    assert(m.map(_.getAs[Boolean]("resumed")).toSeq === Seq(false, true))
    val lin = Lineage.read(spark, root)
    assert(lin.count() >= 1)
    assert(lin.select("config_hash").as[String].head() === cfg.configHash)
  }

  test("end-to-end DedupMain.run is resumable and reproduces clusters") {
    val root = tmpRoot()
    val input = tmpRoot() + "/docs.parquet"
    PagesGen.docs(spark, 300, cfg).toDF().write.parquet(input)
    val c1 = DedupMain.run(spark, input, root, cfg, "r1")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(c1.nonEmpty)
    // second run: everything resumes from manifests, same result
    val c2 = DedupMain.run(spark, input, root, cfg, "r2")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(c1 === c2)
    val m = Metrics.read(spark, root)
    assert(m.where(col("run_id") === "r2" && !col("resumed")).count() === 0,
      "run2 must resume every stage")
  }

  test("pages-shaped input: doc_id from url, E1 extraction when text null") {
    val pages = PagesGen.pages(spark, 40, cfg).toDF()
    val docs = DedupMain.toDocs(pages)
    assert(docs.where(col("text").isNull).count() === 0)
    assert(docs.select(countDistinct("doc_id")).as[Long].head() === 40)
  }
}
