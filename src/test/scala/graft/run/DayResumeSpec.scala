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

  test("day-append: a new crawl day recomputes only that day through docs/shingled/signatures") {
    // 4 synthetic crawl days; run the full pipeline on days 1-3, then again
    // on all 4 days at the same root: the day-incremental stages must build
    // ONLY day 4 (lineage shows exactly one new day per stage), the global
    // stages must recompute (docs_rows key changed), and the result must
    // equal a from-scratch run on the full input.
    val pages = PagesGen.pages(spark, 160, cfg).toDF()
      .withColumn("warc_ts",
        timestamp_seconds(unix_timestamp(col("warc_ts")) +
          pmod(xxhash64(col("url")), lit(4)) * 86400L))
    val days = pages.select(date_trunc("day", col("warc_ts")).as("d"))
      .distinct().orderBy("d").collect().map(_.getTimestamp(0))
    assert(days.length === 4)
    val in3 = tmpRoot() + "/in3.parquet"
    val in4 = tmpRoot() + "/in4.parquet"
    pages.where(date_trunc("day", col("warc_ts")) < lit(days(3))).write.parquet(in3)
    pages.write.parquet(in4)

    val root = tmpRoot()
    DedupMain.run(spark, in3, root, cfg, "run1").count()
    val appended = DedupMain.run(spark, in4, root, cfg, "run2")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet

    // per-stage lineage: run2 added exactly day 4 to each incremental stage
    val lin = Lineage.read(spark, root).where(col("config_hash") === cfg.configHash)
    Seq("docs", "shingled", "signatures", "band_keys").foreach { st =>
      val run2Days = lin.where(col("stage") === st && col("run_id") === "run2")
        .select("warc_day").distinct().as[java.sql.Timestamp].collect().toSet
      assert(run2Days === Set(days(3)), s"stage $st must recompute only day 4, got $run2Days")
      val allDays = lin.where(col("stage") === st)
        .select("warc_day").distinct().as[java.sql.Timestamp].collect().toSet
      assert(allDays === days.toSet, s"stage $st lineage must cover all days")
    }
    // stage tables hold each day exactly once (no double-append)
    assert(spark.read.parquet(s"$root/docs").count() === 160)
    assert(spark.table(Checkpoint.bucketedTableName(root, "shingled")).count() === 160)

    // the pair stage itself went day-incremental: run2 processed exactly
    // one pending day via the new×all path — and the PERSISTED band_keys
    // stage banded ONLY the pending day (rows_out of its non-resumed
    // metrics row == the day-4 partition of the key table), the old
    // corpus's keys being read from storage, never re-derived
    val run2m = Metrics.read(spark, root).where(col("run_id") === "run2")
    assert(run2m.where(col("stage") === "dup_pairs_incremental_days")
      .select("rows_out").as[Long].head() === 1L,
      "run2 must append exactly one pending day of pairs")
    val bkTable = spark.table(Checkpoint.bucketedTableName(root, "band_keys"))
    val bkAppended = run2m.where(col("stage") === "band_keys" && !col("resumed"))
      .select("rows_out").as[Long].head()
    assert(bkAppended === bkTable.where(col("warc_day") === lit(days(3))).count(),
      "the append run must derive band keys ONLY for the pending day")
    assert(bkAppended < bkTable.count(),
      "the key table must still carry the prior days' keys")
    val dupDays = lin.where(col("stage") === "dup_pairs")
    assert(dupDays.where(col("run_id") === "run2")
      .select("warc_day").distinct().as[java.sql.Timestamp].collect().toSet === Set(days(3)))
    assert(dupDays.select("warc_day").distinct().count() === 4,
      "dup_pairs lineage must cover all four days")
    // the day-4 partition holds only pairs involving >= 1 day-4 doc
    val day4Docs = spark.read.parquet(s"$root/docs")
      .where(col("warc_day") === lit(days(3))).select("doc_id")
      .as[Long].collect().toSet
    val day4Pairs = spark.read.parquet(s"$root/dup_pairs")
      .where(col("warc_day") === lit(days(3)))
      .select("a", "b").as[(Long, Long)].collect()
    assert(day4Pairs.forall(p => day4Docs.contains(p._1) || day4Docs.contains(p._2)),
      "appended pairs must all involve a new-day doc (new×all discipline)")

    // parity: incremental result == from-scratch run on the full input
    val freshRoot = tmpRoot()
    val fresh = DedupMain.run(spark, in4, freshRoot, cfg, "fresh")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(appended === fresh, "day-append must equal the from-scratch clusters")

    // third run with no new days: every stage resumes
    DedupMain.run(spark, in4, root, cfg, "run3").count()
    assert(Metrics.read(spark, root)
      .where(col("run_id") === "run3" && !col("resumed")).count() === 0,
      "no-change rerun must resume every stage")
  }

  test("multi-day append: two pending days process in order, parity with from-scratch") {
    // days 1-2 built first, then days 3 AND 4 appended in ONE run: the
    // pending loop must process them oldest-first with a growing context
    // (day-3↔day-4 pairs are generated when day 4 runs, day 3 then being
    // part of "all") and still reproduce the from-scratch clusters.
    val pages = PagesGen.pages(spark, 160, cfg).toDF()
      .withColumn("warc_ts",
        timestamp_seconds(unix_timestamp(col("warc_ts")) +
          pmod(xxhash64(col("url")), lit(4)) * 86400L))
    val days = pages.select(date_trunc("day", col("warc_ts")).as("d"))
      .distinct().orderBy("d").collect().map(_.getTimestamp(0))
    val in2 = tmpRoot() + "/in2.parquet"
    val in4 = tmpRoot() + "/in4.parquet"
    pages.where(date_trunc("day", col("warc_ts")) < lit(days(2))).write.parquet(in2)
    pages.write.parquet(in4)
    val root = tmpRoot()
    DedupMain.run(spark, in2, root, cfg, "base").count()
    val appended = DedupMain.run(spark, in4, root, cfg, "app2")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(Metrics.read(spark, root)
      .where(col("run_id") === "app2" && col("stage") === "dup_pairs_incremental_days")
      .select("rows_out").as[Long].head() === 2L,
      "both pending days must go through the incremental path")
    val freshRoot = tmpRoot()
    val fresh = DedupMain.run(spark, in4, freshRoot, cfg, "fresh2")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(appended === fresh, "two-day append must equal the from-scratch clusters")
  }

  test("HOT-regime day-append: seeded verified lanes, parity with from-scratch") {
    // saltMaxBucket=8 makes the generator's 5% boilerplate clique hot in
    // every band, so the append path exercises the census-salted lane
    // forests (seeded merge-emit), not just the cold new×all listing.
    val hot = cfg.copy(saltMaxBucket = 8)
    val pages = PagesGen.pages(spark, 400, hot).toDF()
      .withColumn("warc_ts",
        timestamp_seconds(unix_timestamp(col("warc_ts")) +
          pmod(xxhash64(col("url")), lit(4)) * 86400L))
    val days = pages.select(date_trunc("day", col("warc_ts")).as("d"))
      .distinct().orderBy("d").collect().map(_.getTimestamp(0))
    val in3 = tmpRoot() + "/in3.parquet"
    val in4 = tmpRoot() + "/in4.parquet"
    pages.where(date_trunc("day", col("warc_ts")) < lit(days(3))).write.parquet(in3)
    pages.write.parquet(in4)
    val root = tmpRoot()
    DedupMain.run(spark, in3, root, hot, "base").count()
    val appended = DedupMain.run(spark, in4, root, hot, "app")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    val freshRoot = tmpRoot()
    val fresh = DedupMain.run(spark, in4, freshRoot, hot, "fresh")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    // the appended day's lane partition equals from-scratch's (identical
    // full census), and the seeded lane ops re-examine every touched
    // lane's pairs — on this fixture the clusters coincide exactly
    assert(appended === fresh,
      s"hot append diverged: only_app=${appended.map(_._1) -- fresh.map(_._1)} " +
        s"only_fresh=${fresh.map(_._1) -- appended.map(_._1)}")
    // every appended pair row is verified by construction: re-verify the
    // day-4 partition's simhash pairs against the exact fingerprints
    val fps = spark.read.parquet(s"$root/docs")
      .select(col("doc_id"), graft.functions.Fns.simhash64(col("text"), hot).as("h"))
      .as[(Long, Long)].collect().toMap
    val day4Pairs = spark.read.parquet(s"$root/dup_pairs")
      .where(col("warc_day") === lit(days(3)) && col("family") === "simhash")
      .select("a", "b").as[(Long, Long)].collect()
    day4Pairs.foreach { case (a, b) =>
      assert(java.lang.Long.bitCount(fps(a) ^ fps(b)) <= hot.hammingThreshold,
        s"appended simhash pair ($a,$b) is not exact-verified")
    }
  }

  test("2-pending-day HOT append: dup_pairs partitions are duplicate-free, parity holds") {
    // the VERDICT_r5 #2 contract: the lane seed refreshes between pending
    // days, so a drift link emitted in pending day k cannot re-emit in day
    // k+1 — zero duplicate (a, b, family) rows across day partitions. The
    // hot regime (saltMaxBucket=8 → the 5% boilerplate clique salts in
    // every band) is where drift links live; a 2-day pending backlog is
    // the geometry that re-emitted them pre-r6.
    val hot = cfg.copy(saltMaxBucket = 8)
    val pages = PagesGen.pages(spark, 400, hot).toDF()
      .withColumn("warc_ts",
        timestamp_seconds(unix_timestamp(col("warc_ts")) +
          pmod(xxhash64(col("url")), lit(4)) * 86400L))
    val days = pages.select(date_trunc("day", col("warc_ts")).as("d"))
      .distinct().orderBy("d").collect().map(_.getTimestamp(0))
    val in2 = tmpRoot() + "/in2.parquet"
    val in4 = tmpRoot() + "/in4.parquet"
    pages.where(date_trunc("day", col("warc_ts")) < lit(days(2))).write.parquet(in2)
    pages.write.parquet(in4)
    val root = tmpRoot()
    DedupMain.run(spark, in2, root, hot, "base").count()
    val appended = DedupMain.run(spark, in4, root, hot, "app2")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(Metrics.read(spark, root)
      .where(col("run_id") === "app2" && col("stage") === "dup_pairs_incremental_days")
      .select("rows_out").as[Long].head() === 2L)
    // duplicate-free across ALL day partitions (within-day dedup already
    // holds via Lsh.dupPairs; cross-day re-emission is what the refreshed
    // seed eliminates)
    val pairRows = spark.read.parquet(s"$root/dup_pairs")
      .groupBy("a", "b", "family").count().where(col("count") > 1).collect()
    assert(pairRows.isEmpty,
      s"duplicate pair rows across day partitions: ${pairRows.take(5).mkString(", ")}")
    // outputs otherwise identical to from-scratch
    val freshRoot = tmpRoot()
    val fresh = DedupMain.run(spark, in4, freshRoot, hot, "fresh2")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(appended === fresh)
  }

  test("crash-resume: the seed refresh covers done days the clusters snapshot misses") {
    // a previous run appended day-3's pair partition and died BEFORE its
    // clusters rebuild: the committed snapshot covers only days 1-2. The
    // resume must refresh the seed over day 3's pairs before appending
    // day 4, or day-4 lanes could re-emit day-3 links (duplicate pair
    // rows) — and clusters must still equal from-scratch.
    val hot = cfg.copy(saltMaxBucket = 8)
    val pages = PagesGen.pages(spark, 400, hot).toDF()
      .withColumn("warc_ts",
        timestamp_seconds(unix_timestamp(col("warc_ts")) +
          pmod(xxhash64(col("url")), lit(4)) * 86400L))
    val days = pages.select(date_trunc("day", col("warc_ts")).as("d"))
      .distinct().orderBy("d").collect().map(_.getTimestamp(0))
    val in2 = tmpRoot() + "/in2.parquet"
    val in3 = tmpRoot() + "/in3.parquet"
    val in4 = tmpRoot() + "/in4.parquet"
    pages.where(date_trunc("day", col("warc_ts")) < lit(days(2))).write.parquet(in2)
    pages.where(date_trunc("day", col("warc_ts")) < lit(days(3))).write.parquet(in3)
    pages.write.parquet(in4)
    val root = tmpRoot()
    DedupMain.run(spark, in2, root, hot, "base").count()
    // snapshot the base clusters state (dir content + manifest)
    val savedClusters = tmpRoot() + "/saved_clusters.parquet"
    spark.read.parquet(s"$root/clusters").write.parquet(savedClusters)
    val baseManifest = Checkpoint.readManifest(spark, root, "clusters").get
    // append day 3 normally, then simulate its crash-before-clusters by
    // restoring the base snapshot + manifest (pairs/lineage keep day 3)
    DedupMain.run(spark, in3, root, hot, "app3").count()
    spark.read.parquet(savedClusters).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$root/clusters")
    Checkpoint.writeManifest(spark, root, baseManifest)
    // resume: append day 4 on the torn state
    val appended = DedupMain.run(spark, in4, root, hot, "app4")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    val dupRows = spark.read.parquet(s"$root/dup_pairs")
      .groupBy("a", "b", "family").count().where(col("count") > 1).collect()
    assert(dupRows.isEmpty,
      s"crash-resume re-emitted pairs: ${dupRows.take(5).mkString(", ")}")
    val freshRoot = tmpRoot()
    val fresh = DedupMain.run(spark, in4, freshRoot, hot, "fresh4")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(appended === fresh)
  }

  test("keepBest quality dedup on the staged path: append invalidates it, parity with from-scratch") {
    val pages = PagesGen.pages(spark, 160, cfg).toDF()
      .withColumn("warc_ts",
        timestamp_seconds(unix_timestamp(col("warc_ts")) +
          pmod(xxhash64(col("url")), lit(3)) * 86400L))
    val days = pages.select(date_trunc("day", col("warc_ts")).as("d"))
      .distinct().orderBy("d").collect().map(_.getTimestamp(0))
    val in2 = tmpRoot() + "/in2.parquet"
    val in3 = tmpRoot() + "/in3.parquet"
    pages.where(date_trunc("day", col("warc_ts")) < lit(days(2))).write.parquet(in2)
    pages.write.parquet(in3)
    val score = "octet_length(text)"
    val root = tmpRoot()
    DedupMain.run(spark, in2, root, cfg, "base", keepBest = Some(score)).count()
    val baseKept = spark.read.parquet(s"$root/deduped")
      .select("doc_id").as[Long].collect().toSet
    DedupMain.run(spark, in3, root, cfg, "app", keepBest = Some(score)).count()
    // the appended day changed the clusters → deduped must recompute
    assert(Metrics.read(spark, root)
      .where(col("run_id") === "app" && col("stage") === "deduped" && !col("resumed"))
      .count() === 1, "append must invalidate the deduped stage")
    val appKept = spark.read.parquet(s"$root/deduped")
      .select("doc_id").as[Long].collect().toSet
    assert(appKept !== baseKept) // day-3 docs joined the corpus
    // parity: winners equal a from-scratch keepBest run on the full input
    val freshRoot = tmpRoot()
    DedupMain.run(spark, in3, freshRoot, cfg, "fresh", keepBest = Some(score)).count()
    val freshKept = spark.read.parquet(s"$freshRoot/deduped")
      .select("doc_id").as[Long].collect().toSet
    assert(appKept === freshKept, "staged keepBest must equal from-scratch winners")
    // and the policy itself matches the facade operator's semantics
    val facade = graft.Dedup.keepBest(
        spark.read.parquet(s"$freshRoot/docs"),
        spark.read.parquet(s"$freshRoot/clusters").select("doc_id", "cluster_id"),
        expr(score))
      .select("doc_id").as[Long].collect().toSet
    assert(freshKept === facade)
    // unchanged rerun resumes the deduped stage
    DedupMain.run(spark, in3, root, cfg, "rerun", keepBest = Some(score)).count()
    assert(Metrics.read(spark, root)
      .where(col("run_id") === "rerun" && col("stage") === "deduped" && col("resumed"))
      .count() === 1, "no-change rerun must resume the deduped stage")
  }

  test("day-incremental stages refuse null warc_day rows loudly") {
    // a null crawl day is invisible to day-granular resume: after the first
    // build such rows would never be pending again and would silently drop
    // out of every incremental run — the stage must refuse up front instead
    val root = tmpRoot()
    val withNullDay = DedupMain.toDocs(
      PagesGen.pages(spark, 20, cfg).toDF()
        .withColumn("warc_ts",
          when(col("url").endsWith("0"), lit(null).cast("timestamp"))
            .otherwise(col("warc_ts"))))
    val err = intercept[IllegalArgumentException] {
      Checkpoint.stageDays(spark, root, "docs", cfg, "run1")(withNullDay)(identity)
    }
    assert(err.getMessage.contains("non-null"))
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
