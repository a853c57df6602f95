package graft.run

import graft.DedupConfig
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * K1/K2/K3 — stage checkpointing, resume gate, metrics + lineage
 * (SURVEY.md §2.9; BASELINE.json:14 "resumable from checkpoint with
 * per-partition lineage and metrics tables").
 *
 * Every pipeline stage materializes to `<root>/<stage>/` with a manifest
 * recording the DedupConfig hash. On restart, a stage whose manifest hash
 * matches is *reused, not recomputed* (the resume gate); any config change
 * invalidates downstream stages automatically because the hash differs.
 * Uses the Hadoop FileSystem API throughout, so the same code runs on
 * local disk, HDFS, or object stores.
 */
object Checkpoint {

  final case class Manifest(stage: String, configHash: String, rowCount: Long, wallMs: Long)

  private def manifestPath(root: String, stage: String) = new Path(s"$root/$stage/_graft_manifest.json")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def readManifest(spark: SparkSession, root: String, stage: String): Option[Manifest] = {
    val p = manifestPath(root, stage)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      // flat, trusted JSON written by writeManifest below
      def field(k: String): String =
        body.split("\"" + k + "\"\\s*:\\s*")(1).split("[,}]")(0).trim.stripPrefix("\"").stripSuffix("\"")
      Some(Manifest(field("stage"), field("configHash"), field("rowCount").toLong, field("wallMs").toLong))
    }
  }

  private[run] def writeManifest(spark: SparkSession, root: String, m: Manifest): Unit = {
    val p = manifestPath(root, m.stage)
    val f = fs(spark, p)
    val out = f.create(p, true)
    val json = s"""{"stage":"${m.stage}","configHash":"${m.configHash}","rowCount":${m.rowCount},"wallMs":${m.wallMs}}"""
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Stable managed-table name for a bucketed stage (the metastore is
    * session-global, so the root path is folded in to keep concurrent runs
    * apart). */
  def bucketedTableName(root: String, stage: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(root.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    s"graft_${stage}_$h"
  }

  /**
   * Bucketed variant of `stage`: materializes into a managed table
   * bucketed+sorted by `byCol` (locally parquet bucketing; Iceberg
   * `bucket(n, col)` in prod via the TableIO seam), so every later join on
   * `byCol` — the verify joins each incremental re-run repeats — reads the
   * table WITHOUT an Exchange on this side. Resume gate identical to
   * `stage`.
   */
  def stageBucketed(spark: SparkSession, root: String, name: String, cfg: DedupConfig,
                    runId: String, buckets: Int, byCol: String)
                   (build: => DataFrame): DataFrame = {
    val tbl = bucketedTableName(root, name)
    readManifest(spark, root, name) match {
      case Some(m) if m.configHash == cfg.configHash && spark.catalog.tableExists(tbl) =>
        Metrics.append(spark, root, runId, name, m.rowCount, 0L, resumed = true)
        spark.table(tbl)
      case _ =>
        val t0 = System.nanoTime()
        graft.sources.TableIO.writeBucketed(build, tbl, buckets, byCol, Some(byCol))
        val out = spark.table(tbl)
        val rows = out.count()
        val wallMs = (System.nanoTime() - t0) / 1000000L
        writeManifest(spark, root, Manifest(name, cfg.configHash, rows, wallMs))
        Metrics.append(spark, root, runId, name, rows, wallMs, resumed = false)
        Lineage.append(spark, root, runId, name, cfg.configHash, out)
        out
    }
  }

  /** Manifest key for a stage: the configHash, optionally extended with an
    * input-derived discriminator (`extraKey`). The dup_pairs stage folds its
    * byte-scaled substring shard count in, so a resume against a GROWN
    * corpus (different shard composition ⇒ different within-shard pair
    * sets at the same configHash) is detected and recomputed instead of
    * silently reusing stale pairs; global stages downstream of the
    * day-incremental ones fold the docs row count in for the same reason
    * (a day-append must invalidate them). */
  def stageKey(cfg: DedupConfig, extraKey: String): String = {
    require(!extraKey.exists(c => c == ',' || c == '}' || c == '"'),
      s"extraKey must survive the flat-JSON manifest parser: $extraKey")
    if (extraKey.isEmpty) cfg.configHash else s"${cfg.configHash}:$extraKey"
  }

  /** Days already recorded done by `stage` at this configHash — driver-side
    * (day cardinality is tiny: one per crawl day). Empty when no lineage
    * exists yet. */
  private[run] def doneDaySet(spark: SparkSession, root: String, stage: String,
                              cfg: DedupConfig): Set[java.sql.Timestamp] = {
    val linPath = new Path(s"$root/_lineage")
    if (!fs(spark, linPath).exists(linPath)) Set.empty
    else Resume.doneDays(
        Lineage.read(spark, root).where(col("stage") === stage), cfg.configHash)
      .collect().map(_.getTimestamp(0)).toSet
  }

  /** Distinct `warc_day` values of a day-carrying input — one column-pruned
    * pass (prod Iceberg answers this from partition metadata without
    * scanning data files). LOUD on nulls: a null crawl day is invisible to
    * day-granular resume — after the initial build, such rows would never
    * be pending and thus be silently dropped from every incremental run.
    * Refusing up front (on the full build too) turns silent data loss into
    * an immediate, explained error. */
  private def dayValues(input: DataFrame): Set[java.sql.Timestamp] = {
    val vals = input.select("warc_day").distinct().collect()
      .map(r => Option(r.getTimestamp(0))).toSet
    require(!vals.contains(None),
      "day-incremental stage requires a non-null warc_ts/warc_day on every " +
        "row: null-day rows are invisible to day-granular resume and would " +
        "be silently lost on incremental runs — stamp a real crawl " +
        "timestamp, or use the day-less stage path for this input")
    vals.flatten
  }

  /**
   * Day-incremental stage (K2 at crawl-day granularity — the unit prod
   * Iceberg partitions on, BASELINE.json:15 `days(warc_ts)`): output is
   * partitioned by `warc_day`, and a re-run at the SAME configHash builds
   * only the input days this stage's lineage has not recorded, appending
   * them while prior days' files stay untouched — a new crawl day costs one
   * day's compute, not a corpus recompute. A configHash change still
   * recomputes everything (the resume contract). `input` must carry a
   * non-null `warc_day` column; `build` must preserve it.
   */
  def stageDays(spark: SparkSession, root: String, name: String, cfg: DedupConfig,
                runId: String)(input: DataFrame)(build: DataFrame => DataFrame): DataFrame = {
    val dir = s"$root/$name"
    val inDays = dayValues(input) // also validates: nulls are refused loudly
    val sameCfg = readManifest(spark, root, name).exists(_.configHash == cfg.configHash)
    if (!sameCfg) {
      val t0 = System.nanoTime()
      build(input).write.mode(SaveMode.Overwrite).partitionBy("warc_day").parquet(dir)
      val out = spark.read.parquet(dir)
      val rows = out.count()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      writeManifest(spark, root, Manifest(name, cfg.configHash, rows, wallMs))
      Metrics.append(spark, root, runId, name, rows, wallMs, resumed = false)
      Lineage.append(spark, root, runId, name, cfg.configHash, out)
      out
    } else {
      val pending = (inDays -- doneDaySet(spark, root, name, cfg)).toSeq
      if (pending.isEmpty) {
        Metrics.append(spark, root, runId, name,
          readManifest(spark, root, name).map(_.rowCount).getOrElse(0L), 0L, resumed = true)
        spark.read.parquet(dir)
      } else {
        val t0 = System.nanoTime()
        // dynamic partition overwrite, NOT append: a run killed between the
        // data write and the lineage append leaves the day's partition
        // written but unrecorded — the restart recomputes it, and overwrite
        // replaces the torn partition instead of double-appending rows
        build(input.where(col("warc_day").isin(pending: _*)))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("warc_day").parquet(dir)
        val out = spark.read.parquet(dir)
        val appended = out.where(col("warc_day").isin(pending: _*))
        val newRows = appended.count()
        val wallMs = (System.nanoTime() - t0) / 1000000L
        // manifest rowCount is a FULL recount, not previous+new: after a
        // torn run (crash between manifest write and lineage append) the
        // restart recomputes the day, and an incremental sum would count it
        // twice — drifting the docs_rows resume key and metrics. Parquet
        // footer counts make the recount metadata-cheap.
        writeManifest(spark, root, Manifest(name, cfg.configHash, out.count(), wallMs))
        Metrics.append(spark, root, runId, name, newRows, wallMs, resumed = false)
        Lineage.append(spark, root, runId, name, cfg.configHash, appended)
        out
      }
    }
  }

  /** Day-incremental variant of `stageBucketed`: the managed table is
    * partitioned by `warc_day` ON TOP of the doc_id bucketing (the local
    * mirror of Iceberg `bucket(n, doc_id) × days(warc_ts)`), so a new crawl
    * day appends its partition into the table — later doc_id joins stay
    * Exchange-free AND a day-append re-shingles only the new day.
    *
    * Torn-append safety: saveAsTable(Append) into a bucketed table cannot
    * do dynamic partition overwrite, so a run killed between the data
    * append and the lineage append leaves a day written but unrecorded.
    * Such "torn" days (in the table, not in lineage) are detected at entry
    * and trigger a full rebuild — a rare crash costs one recompute, never
    * silent row duplication. Prod Iceberg replaces the append with an
    * atomic REPLACE PARTITIONS commit, which removes the case entirely. */
  def stageBucketedDays(spark: SparkSession, root: String, name: String, cfg: DedupConfig,
                        runId: String, buckets: Int, byCol: String)
                       (input: DataFrame)(build: DataFrame => DataFrame): DataFrame = {
    val tbl = bucketedTableName(root, name)
    val inDays = dayValues(input) // also validates: nulls are refused loudly
    val sameCfg = readManifest(spark, root, name).exists(_.configHash == cfg.configHash) &&
      spark.catalog.tableExists(tbl)
    val torn = sameCfg &&
      (dayValues(spark.table(tbl)) -- doneDaySet(spark, root, name, cfg)).nonEmpty
    if (!sameCfg || torn) {
      val t0 = System.nanoTime()
      graft.sources.TableIO.writeBucketed(build(input), tbl, buckets, byCol,
        Some(byCol), Seq("warc_day"))
      val out = spark.table(tbl)
      val rows = out.count()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      writeManifest(spark, root, Manifest(name, cfg.configHash, rows, wallMs))
      Metrics.append(spark, root, runId, name, rows, wallMs, resumed = false)
      Lineage.append(spark, root, runId, name, cfg.configHash, out)
      out
    } else {
      val pending = (inDays -- doneDaySet(spark, root, name, cfg)).toSeq
      if (pending.isEmpty) {
        Metrics.append(spark, root, runId, name,
          readManifest(spark, root, name).map(_.rowCount).getOrElse(0L), 0L, resumed = true)
        spark.table(tbl)
      } else {
        val t0 = System.nanoTime()
        graft.sources.TableIO.writeBucketed(
          build(input.where(col("warc_day").isin(pending: _*))), tbl, buckets, byCol,
          Some(byCol), Seq("warc_day"), SaveMode.Append)
        val out = spark.table(tbl)
        val appended = out.where(col("warc_day").isin(pending: _*))
        val newRows = appended.count()
        val wallMs = (System.nanoTime() - t0) / 1000000L
        // full recount — same torn-run drift rationale as stageDays
        writeManifest(spark, root, Manifest(name, cfg.configHash, out.count(), wallMs))
        Metrics.append(spark, root, runId, name, newRows, wallMs, resumed = false)
        Lineage.append(spark, root, runId, name, cfg.configHash, appended)
        out
      }
    }
  }

  /**
   * Run (or resume) one stage: if `<root>/<stage>` carries a manifest with
   * the current configHash (+ extraKey), read it back; otherwise compute
   * `build`, write parquet + manifest + metrics/lineage rows, and read back
   * (so downstream always consumes the materialized, lineage-truncated
   * form).
   */
  def stage(spark: SparkSession, root: String, name: String, cfg: DedupConfig,
            runId: String, extraKey: String = "")(build: => DataFrame): DataFrame = {
    val dir = s"$root/$name"
    val key = stageKey(cfg, extraKey)
    readManifest(spark, root, name) match {
      case Some(m) if m.configHash == key =>
        Metrics.append(spark, root, runId, name, m.rowCount, 0L, resumed = true)
        spark.read.parquet(dir)
      case _ =>
        val t0 = System.nanoTime()
        val df = build
        df.write.mode(SaveMode.Overwrite).parquet(dir)
        val out = spark.read.parquet(dir)
        val rows = out.count()
        val wallMs = (System.nanoTime() - t0) / 1000000L
        writeManifest(spark, root, Manifest(name, key, rows, wallMs))
        Metrics.append(spark, root, runId, name, rows, wallMs, resumed = false)
        Lineage.append(spark, root, runId, name, key, out)
        out
    }
  }
}

/** SNK2/K3 — append-only metrics table at `<root>/_metrics`. */
object Metrics {
  def append(spark: SparkSession, root: String, runId: String, stageName: String,
             rowsOut: Long, wallMs: Long, resumed: Boolean): Unit = {
    import spark.implicits._
    Seq((runId, stageName, rowsOut, wallMs, resumed, java.time.Instant.now().toString))
      .toDF("run_id", "stage", "rows_out", "wall_ms", "resumed", "ts")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(s"$root/_metrics")
  }

  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/_metrics")
}

/** SNK3/K3 — per-partition lineage rows at `<root>/_lineage`: which input
  * partitions (crawl days → Iceberg `days(warc_ts)` partitions in prod)
  * produced each stage output, keyed by configHash for the resume gate.
  *
  * When the stage output carries a `warc_day` column (the docs stage does,
  * via `DedupMain.toDocs`), lineage aggregates per crawl day and stamps it —
  * that column is what `Resume.doneDays` reads for partial-partition
  * restarts. Day-less stages fall back to spark_partition_id with a null
  * warc_day, so the schema is uniform across stages. */
object Lineage {
  def append(spark: SparkSession, root: String, runId: String, stageName: String,
             configHash: String, df: DataFrame): Unit = {
    val hasDay = df.columns.contains("warc_day")
    if (hasDay) {
      // per-day counts collected and ranked DRIVER-side: one row per crawl
      // day (tiny by construction), and the previous dense_rank over an
      // UNPARTITIONED window funneled the (one-row-per-day) aggregate
      // through a single global-sort task — the only WindowExec in the
      // pipeline, gone for free
      val dayRows = df.groupBy(col("warc_day")).agg(count(lit(1)).as("rows"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getLong(1)))
        // null day (a day-less input routed through a warc_day-carrying
        // schema) sorts first; doneDays ignores null-day rows downstream
        .sortBy(t => Option(t._1).map(_.getTime).getOrElse(Long.MinValue))
      appendDays(spark, root, runId, stageName, configHash, dayRows.toSeq)
    } else {
      df.groupBy(spark_partition_id().as("input_partition"))
        .agg(count(lit(1)).as("rows"))
        .withColumn("warc_day", lit(null).cast("timestamp"))
        .select(lit(runId).as("run_id"), lit(stageName).as("stage"),
                col("input_partition"), col("warc_day"), col("rows"),
                lit(configHash).as("config_hash"), lit("ok").as("status"))
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(s"$root/_lineage")
    }
  }

  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/_lineage")

  /** Driver-built day rows for stages whose output is not itself
    * day-stamped row-by-row (the pair table: a pair SPANS days; its
    * generation day is an attribute, not a grouping of output rows).
    * Marks every listed day done — including zero-row days, which must
    * still be recorded or the append gate would reprocess them forever. */
  def appendDays(spark: SparkSession, root: String, runId: String, stageName: String,
                 configHash: String,
                 dayRows: Seq[(java.sql.Timestamp, Long)]): Unit = {
    import spark.implicits._
    dayRows.zipWithIndex
      .map { case ((d, n), i) => (runId, stageName, i + 1, d, n, configHash, "ok") }
      .toDF("run_id", "stage", "input_partition", "warc_day", "rows",
            "config_hash", "status")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(s"$root/_lineage")
  }
}

/** K2/J3 — partition-level resume filters: restrict the input scan to
  * partitions not yet processed at this configHash. Local parquet mirrors
  * the prod Iceberg layout (`days(warc_ts)` partitioning), so the same
  * anti-join prunes files there and data-files here. */
object Resume {
  import org.apache.spark.sql.functions.{col, date_trunc}

  /** Pages not belonging to an already-done crawl day (left anti join —
    * the op the resume gate uses for partial-partition restarts). */
  def pendingDays(pages: org.apache.spark.sql.DataFrame,
                  doneDays: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    pages.withColumn("warc_day", date_trunc("day", col("warc_ts")))
      .join(doneDays.select(col("warc_day")), Seq("warc_day"), "left_anti")
      .drop("warc_day")

  /** Days recorded done in a lineage table for a config (null warc_day rows
    * — day-less stages — are never "done days"). Feed `Lineage.read(spark,
    * root)` straight in; `Lineage.append` stamps warc_day at write time. */
  def doneDays(lineage: org.apache.spark.sql.DataFrame, configHash: String): org.apache.spark.sql.DataFrame =
    lineage.where(col("config_hash") === configHash && col("status") === "ok"
                    && col("warc_day").isNotNull)
      .select(col("warc_day")).distinct()
}
