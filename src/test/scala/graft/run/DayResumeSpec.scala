package graft.run

import graft.{DedupConfig, SparkSuite}
import graft.sources.PagesGen
import org.apache.spark.sql.functions._

/**
 * J3/K2/SNK3 end-to-end: day-level resume through the REAL composition —
 * Checkpoint.stage → Lineage.read → Resume.doneDays → Resume.pendingDays —
 * with no hand-built lineage DataFrame. Simulates a kill after 2 of 3 crawl
 * days were processed and asserts the restart recomputes only day 3.
 */
class DayResumeSpec extends SparkSuite {
  import spark.implicits._
  private val cfg = DedupConfig.test

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-dayresume").toString

  test("kill after 2 of 3 days: restart processes exactly the third day") {
    // spread the generator's single-day corpus across 3 synthetic days
    val pages = PagesGen.pages(spark, 120, cfg).toDF()
      .withColumn("warc_ts",
        timestamp_seconds(unix_timestamp(col("warc_ts")) +
          pmod(xxhash64(col("url")), lit(3)) * 86400L))
    val days = pages.select(date_trunc("day", col("warc_ts")).as("d"))
      .distinct().orderBy("d").collect().map(_.getTimestamp(0))
    assert(days.length === 3)

    // ---- first (killed) run: only days 1-2 reach the docs stage
    val root = tmpRoot()
    val firstTwo = pages.where(date_trunc("day", col("warc_ts")) < lit(days(2)))
    Checkpoint.stage(spark, root, "docs", cfg, "run1")(DedupMain.toDocs(firstTwo))

    // ---- restart: done days come from the lineage table as written
    val done = Resume.doneDays(Lineage.read(spark, root), cfg.configHash)
    assert(done.as[java.sql.Timestamp].collect().toSet === days.take(2).toSet)

    val pending = Resume.pendingDays(pages, done)
    val day3Expected = pages.where(date_trunc("day", col("warc_ts")) === lit(days(2)))
    assert(pending.count() === day3Expected.count())
    assert(pending.select(date_trunc("day", col("warc_ts")))
      .distinct().as[java.sql.Timestamp].collect().toSeq === Seq(days(2)))

    // a different configHash must see NO done days (full recompute)
    val other = Resume.doneDays(Lineage.read(spark, root), cfg.copy(k = 5).configHash)
    assert(other.count() === 0)
  }

  test("day-less stages write null warc_day and never mark days done") {
    val root = tmpRoot()
    Checkpoint.stage(spark, root, "shingled", cfg, "run1") {
      PagesGen.docs(spark, 30, cfg).toDF()
    }
    val lin = Lineage.read(spark, root)
    assert(lin.where(col("warc_day").isNotNull).count() === 0)
    assert(Resume.doneDays(lin, cfg.configHash).count() === 0)
  }
}
