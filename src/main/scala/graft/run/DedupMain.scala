package graft.run

import graft.DedupConfig
import graft.functions.Fns
import graft.operators.{ConnectedComponents, ExactSubstr, Lsh}
import org.apache.hadoop.fs.Path
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

  /** All args are parsed first and the config constructed ONCE at the end —
    * the bands×rows==numPerm invariant must not fire on intermediate states
    * (`numPerm=64 bands=16` is valid but unreachable arg-by-arg). */
  def parseConfig(args: Seq[String]): DedupConfig = {
    val kv = args.map { a =>
      a.split("=", 2) match {
        case Array(k, v) => (k, v)
        case _ => sys.error(s"bad config arg (want key=value): $a")
      }
    }.toMap
    val known = Set("k", "numPerm", "bands", "rows", "jaccard", "hamming",
      "gramLen", "winnowW", "saltMaxBucket", "substrMinFrac", "substrShards",
      "pairListMaxClique", "simhashBlocks", "shingleUnit", "seed")
    kv.keys.find(!known.contains(_)).foreach(k => sys.error(s"unknown config arg: $k"))
    val d = DedupConfig.test
    def i(k: String, dv: Int) = kv.get(k).map(_.toInt).getOrElse(dv)
    DedupConfig(
      shingleUnit = kv.getOrElse("shingleUnit", d.shingleUnit),
      k = i("k", d.k),
      numPerm = i("numPerm", d.numPerm),
      bands = i("bands", d.bands),
      rows = i("rows", d.rows),
      jaccardThreshold = kv.get("jaccard").map(_.toDouble).getOrElse(d.jaccardThreshold),
      hammingThreshold = i("hamming", d.hammingThreshold),
      gramLen = i("gramLen", d.gramLen),
      winnowW = i("winnowW", d.winnowW),
      substrMinFrac = kv.get("substrMinFrac").map(_.toDouble).getOrElse(d.substrMinFrac),
      substrShards = i("substrShards", d.substrShards),
      pairListMaxClique = i("pairListMaxClique", d.pairListMaxClique),
      saltMaxBucket = i("saltMaxBucket", d.saltMaxBucket),
      simhashBlocks = i("simhashBlocks", d.simhashBlocks),
      seed = kv.get("seed").map(java.lang.Long.decode(_).longValue).getOrElse(d.seed))
  }

  /** Normalize any accepted input shape to (doc_id, text, lang, warc_day).
    * `warc_day` (day-truncated warc_ts, null for day-less inputs) rides
    * along so the docs stage's lineage rows carry the crawl-day partition
    * value — the key `Resume.doneDays`/`pendingDays` resume on. */
  def toDocs(input: DataFrame): DataFrame = {
    val cols = input.columns.toSet
    val day =
      if (cols.contains("warc_ts")) date_trunc("day", col("warc_ts"))
      else lit(null).cast("timestamp")
    if (cols.contains("url")) {
      // canonical pages: extract when text is null, stable id from url
      input.select(
        xxhash64(col("url")).as("doc_id"),
        coalesce(col("text"), Fns.htmlToText(col("html"))).as("text"),
        col("lang"),
        day.as("warc_day"))
    } else {
      input.select(col("doc_id"), col("text"), col("lang"), day.as("warc_day"))
    }
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The full pipeline, stage-checkpointed under `root`. Returns clusters.
    *
    * `keepBest` (CLI arg `keepBest=<sql-expr>`) additionally materializes
    * the quality-aware dedup stage `<root>/deduped`: every cluster keeps
    * its highest-scoring member (`Dedup.keepBest` — the training-data
    * "keep the best copy" policy, q33's operator on the spark-submit
    * path). The expression is evaluated over the docs stage's columns.
    * Its stage key folds the CLUSTERS stage's own key plus the score
    * expression, so a config change, an input change, an appended day or a
    * different score each invalidate it, while a pure resume reuses it. */
  def run(spark: SparkSession, inputRef: String, root: String, cfg: DedupConfig,
          runId: String = java.util.UUID.randomUUID().toString,
          keepBest: Option[String] = None): DataFrame = {
    def stage(name: String)(build: => DataFrame): DataFrame =
      Checkpoint.stage(spark, root, name, cfg, runId)(build)

    // durable RDD checkpoints (CC iteration snapshots) live under the run
    // root — same filesystem as the stage outputs, survives executor loss
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(s"$root/_ckpt")

    val raw = graft.sources.TableIO.read(spark, inputRef)
    // crawl-day granularity (BASELINE.json:15 `days(warc_ts)` partitioning):
    // inputs that carry warc_ts go through the day-incremental stages — a
    // day-append run recomputes docs/shingles/signatures for the NEW days
    // only and appends their partitions; day-less document tables keep the
    // whole-stage gate
    val dayGranular = raw.columns.contains("warc_ts")
    val docs =
      if (dayGranular)
        Checkpoint.stageDays(spark, root, "docs", cfg, runId)(toDocs(raw))(identity)
      else stage("docs") { toDocs(raw) }
    // shingles + signatures are the tables every verify join (and every
    // incremental re-run) re-joins on doc_id — bucketing them by doc_id
    // makes those joins Exchange-free on this (heavy) side
    val buckets = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    def stageBucketed(name: String)(build: => DataFrame): DataFrame =
      Checkpoint.stageBucketed(spark, root, name, cfg, runId, buckets, "doc_id")(build)
    def stageBucketedDays(name: String)(build: DataFrame => DataFrame): DataFrame =
      Checkpoint.stageBucketedDays(spark, root, name, cfg, runId, buckets, "doc_id")(docs)(build)
    val shingled =
      if (dayGranular) stageBucketedDays("shingled") { d =>
        d.select(col("doc_id"), Fns.shingleHashes(col("text"), cfg).as("shingles"),
                 col("warc_day"))
      }
      else stageBucketed("shingled") { Lsh.shingled(docs, cfg) }
    val signatures =
      if (dayGranular) stageBucketedDays("signatures") { d =>
        // one pass over the pending days' docs computes both fingerprints
        // (same expression composition as the batch/streaming paths)
        d.select(col("doc_id"),
                 Fns.minhashSig(Fns.shingleHashes(col("text"), cfg), cfg).as("minhash"),
                 Fns.simhash64(col("text"), cfg).as("simhash"),
                 col("warc_day"))
      }
      else stageBucketed("signatures") {
        Lsh.signatures(shingled, cfg)
          .join(Lsh.simhashes(docs, cfg), "doc_id")
      }
    // the global stages below consume ALL days — a day-append changes their
    // input, which the configHash alone cannot see: fold the docs row count
    // into their resume keys so stale reuse is impossible
    val docsRows = Checkpoint.readManifest(spark, root, "docs").map(_.rowCount).getOrElse(-1L)
    val inputKey = s"docs_rows=$docsRows"

    /** Raw (unsalted) per-doc band keys for BOTH banded families — the
      * persisted band_keys stage's content: (doc_id, key, family, simhash
      * [, warc_day]). sh rows carry the fingerprint (+8 B/row) for the
      * in-task verified-forest listing; mh rows carry a null. Salting /
      * hot-census is NOT stored: it is a census over the whole corpus
      * (which every append would invalidate), recomputed at listing time
      * from the materialized key table — one pruned groupBy, no
      * re-derivation. Day-granular inputs carry warc_day through (the
      * band-key builders pass non-signature columns through), so the stage
      * partitions by crawl day and a day-append bands ONLY pending days. */
    def rawBandKeys(sigs: DataFrame): DataFrame = {
      val carry =
        if (sigs.columns.contains("warc_day")) Seq(col("warc_day")) else Nil
      val mh = Lsh.minhashBandKeys(
          sigs.select((col("doc_id") +: col("minhash") +: carry): _*), cfg)
        .select((Seq(col("doc_id"), col("key")) ++ carry): _*)
        .withColumn("family", lit("minhash"))
        .withColumn("simhash", lit(null).cast("long"))
      val sh = Lsh.simhashBandKeys(
          sigs.select((col("doc_id") +: col("simhash") +: carry): _*), cfg,
          carryHash = true)
        .select((Seq(col("doc_id"), col("key"), col("simhash")) ++ carry): _*)
        .withColumn("family", lit("simhash"))
      mh.unionByName(sh)
    }
    // Day-granular: band_keys is a DAY-INCREMENTAL stage bucketed by KEY
    // (warc_day partitions × bucket(n, key) — the census groupBy and every
    // bucket join on `key` read it Exchange-free on this heavy side). The
    // r4 append path re-derived the OLD corpus's keys from signatures on
    // every appended day — corpus×52 posexplode + shuffles + a corpus-key
    // block cache, measured ~80% of the append wall; now the old side is a
    // partition-pruned scan of this stage and only pending days are banded.
    val bandKeysDay: Option[DataFrame] =
      if (dayGranular)
        Some(Checkpoint.stageBucketedDays(spark, root, "band_keys", cfg, runId,
            buckets, "key")(signatures) { sigs =>
          // align writer tasks with the bucket spec: one file per bucket
          // per day, not one per task per bucket
          rawBandKeys(sigs).repartition(buckets, col("key"))
        })
      else None
    // Substring sharding scales with corpus bytes (determinism: a pure
    // function of input content, not parallelism — ExactSubstr.shardsFor is
    // the single source of truth shared with the Dedup facade/SparkEntry).
    // The shard count is folded into the dup_pairs resume key, so a restart
    // against a corpus that grew past a shard boundary recomputes (full
    // path) or day-appends (incremental path) instead of silently reusing
    // stale pairs. One column-pruned scan of the materialized docs stage.
    val totalTextBytes = ExactSubstr.totalTextBytes(docs)
    val substrShards = ExactSubstr.shardsFor(totalTextBytes, cfg)
    // ';' separator — the manifest's flat JSON parser treats ',' as a
    // field delimiter, so a comma inside the key would corrupt the readback
    val substrKey = s"$inputKey;substr_shards=$substrShards"
    val dupKey = Checkpoint.stageKey(cfg, substrKey)
    val dupDir = s"$root/dup_pairs"
    val prevDup = Checkpoint.readManifest(spark, root, "dup_pairs")
    val substrDropped = spark.sparkContext.longAccumulator("substr_starcap_dropped_pairs")
    val simhashSuppressed = spark.sparkContext.longAccumulator("simhash_starcap_suppressed_pairs")
    val minhashLaneSuppressed = spark.sparkContext.longAccumulator("minhash_lane_suppressed_pairs")

    /** Full-corpus three-family build → LAZY (a, b, family) plan. Consumes
      * the persisted raw band_keys stage (building it when absent), salts
      * at listing time, and records the loud-cap drop estimates
      * (Lsh.saltedDropEstimate contract). */
    def buildAllPairs(): DataFrame = {
      // the band index is folded into `key` (Lsh.minhashBandKeys /
      // simhashBandKeys), so the bucket identity downstream is (key, salt).
      // fmt=2: the day-less stage now stores RAW keys (salt applied on
      // read) — folding the format into the resume key makes an old-format
      // root recompute instead of failing on the changed schema.
      val rawKeys = bandKeysDay.getOrElse(
        Checkpoint.stage(spark, root, "band_keys", cfg, runId,
          s"$inputKey;fmt=2")(rawBandKeys(signatures)))
      Seq("minhash", "simhash").foreach { fam =>
        Metrics.append(spark, root, runId, s"salted_drop_est_$fam",
          Lsh.saltedDropEstimate(rawKeys.where(col("family") === fam), cfg),
          0L, resumed = false)
      }
      val mhSalted = Lsh.saltBandKeys(
        rawKeys.where(col("family") === "minhash").select("doc_id", "key"),
        cfg, materialized = true)
      // is_hot MUST survive into the listing: it keys the star-vs-clique
      // discipline — dropping it would run the full self-join over hot salt
      // lanes (quadratic boilerplate blowup) and diverge from the Dedup
      // facade at the same configHash. (Absent only when salting is off.)
      // Hot lanes come back ALREADY exact-verified (in-task Jaccard forest,
      // joined against the doc_id-bucketed shingled stage).
      val mhCols = Seq("doc_id", "key", "salt") ++
        (if (mhSalted.columns.contains("is_hot")) Seq("is_hot") else Nil)
      val (mhCands, mhHot) = Lsh.minhashListing(
        mhSalted.select(mhCols.map(col): _*),
        shingled.select("doc_id", "shingles"), cfg, Some(minhashLaneSuppressed))
      val mhc = mhCands
        .localCheckpoint(false, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val mhHotC = mhHot
        .localCheckpoint(false, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      // simhash pair listing runs the in-task verified-forest cap
      // (Lsh.hammingCappedPairs — clusters identical to uncapped; join
      // listing when salting is off); the suppressed-pair count is EXACT,
      // recorded after the stage action
      val shc = Lsh.simhashCandidatePairs(
          Lsh.saltBandKeys(
            rawKeys.where(col("family") === "simhash")
              .select("doc_id", "key", "simhash"),
            cfg, materialized = true)
            .select("doc_id", "key", "salt", "simhash"),
          cfg, Some(simhashSuppressed))
        .localCheckpoint(false, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val sub = ExactSubstr.substrDupPairs(docs, cfg, Some(substrShards), Some(substrDropped))
        .localCheckpoint(false, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      // ONE action materializes both lazy candidate checkpoints AND the
      // independent substring family: the union job runs all three
      // families' stages over the shared executor pool concurrently
      // (separate count() actions serialized them — observed stage-gap at
      // 960k docs; the suffix-array scan has no dependency on the banding
      // chains), and the per-family counts gate the broadcast
      // semi-restriction below.
      val famCounts = mhc.select(lit("mh").as("fam"))
        .unionByName(mhHotC.select(lit("mhv").as("fam")))
        .unionByName(shc.select(lit("sh").as("fam")))
        .unionByName(sub.select(lit("sub").as("fam")))
        .groupBy("fam").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val (nMh, nSh) = (famCounts.getOrElse("mh", 0L), famCounts.getOrElse("sh", 0L))
      // hot-lane edges are already exact-verified in-task — only the cold
      // candidates go through the verify join
      val mh = Lsh.verifyJaccard(
          mhc, Lsh.restrictToCandidateDocs(shingled, mhc, 2 * nMh), cfg)
        .unionByName(mhHotC)
      val sh = Lsh.verifyHamming(
        shc, Lsh.restrictToCandidateDocs(
          signatures.select("doc_id", "simhash"), shc, 2 * nSh), cfg)
      Lsh.dupPairs(mh, sh, sub)
    }
    def pairMetricsAfterBuild(): Unit = {
      Metrics.append(spark, root, runId, "substr_shards", substrShards.toLong, 0L, resumed = false)
      Metrics.append(spark, root, runId, "substr_starcap_dropped_pairs",
        substrDropped.value, 0L, resumed = false)
      // exact (task-counted) redundant-for-connectivity verified pairs the
      // simhash forest suppressed — loud cap, never silent
      Metrics.append(spark, root, runId, "simhash_starcap_suppressed_pairs",
        simhashSuppressed.value, 0L, resumed = false)
      // minhash hot lanes: pairs skipped as already-connected through
      // verified edges (upper bound on redundant verified pairs) — loud
      Metrics.append(spark, root, runId, "minhash_lane_suppressed_pairs",
        minhashLaneSuppressed.value, 0L, resumed = false)
    }

    val inDays: Seq[java.sql.Timestamp] =
      if (dayGranular)
        docs.select("warc_day").distinct().collect()
          .map(_.getTimestamp(0)).toSeq.sortBy(_.getTime)
      else Seq.empty

    val dupPairs: DataFrame =
      if (!dayGranular) {
        // day-less inputs keep the whole-stage gate: any input change
        // (docs_rows / shard count in the key) recomputes from scratch
        val resumed = prevDup.exists(_.configHash == dupKey)
        val out = Checkpoint.stage(spark, root, "dup_pairs", cfg, runId, substrKey)(buildAllPairs())
        if (!resumed) pairMetricsAfterBuild()
        out
      } else {
        // Day-granular pair store: partitioned by the pair's GENERATION day
        // (max of its two docs' crawl days — the day the pair first became
        // generable in day-ordered processing), with per-day lineage rows
        // under the BARE configHash so day bookkeeping survives input-key
        // changes. Three states:
        //  1. manifest key matches (same config, same input) → resume;
        //  2. same configHash, lineage covers a strict subset of the input
        //     days → DAY-APPEND: each pending day costs new×all candidate
        //     generation + verify, not all×all (the streaming bridge's
        //     discipline, ported);
        //  3. otherwise (first build / config change / shrunk input) →
        //     full build.
        val doneDays = Checkpoint.doneDaySet(spark, root, "dup_pairs", cfg)
        val pending = inDays.filterNot(doneDays.contains)
        // previous state at the SAME config: (docs_rows, substr_shards) it
        // was built at. The shard count is PINNED across appends (shard
        // assignment must match the accumulated pair table), with
        // hysteresis: once the corpus outgrows ~2× the per-shard byte
        // target, fall back to a full rebuild at a fresh byte-scaled count
        // — amortized O(log growth) rebuilds.
        val dayKeyRe =
          (java.util.regex.Pattern.quote(cfg.configHash) +
            ":docs_rows=(-?\\d+);substr_shards=(\\d+)").r
        val prevKeyInfo: Option[(Long, Int)] = prevDup.map(_.configHash).flatMap {
          case dayKeyRe(r, s) => Some((r.toLong, s.toInt))
          case _ => None
        }
        val prevShards = prevKeyInfo.map(_._2)
        val shardsFit = prevShards.exists(s =>
          totalTextBytes <= 2L * s * ExactSubstr.TargetShardBytes)
        // torn-dir gate: a state-3 full Overwrite that crashed mid-write
        // leaves a partial dup_pairs dir while OLDER per-day lineage (same
        // bare configHash) survives — appending onto it would silently
        // lose the old days' pairs. _SUCCESS only exists after a completed
        // job commit (a torn per-day dynamic overwrite keeps the previous
        // commit's marker AND its partial files invisible in _temporary),
        // so requiring it forces the full rebuild exactly when needed.
        val fsForDir = new Path(dupDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dupDirCommitted = fsForDir.exists(new Path(s"$dupDir/_SUCCESS"))
        if (prevKeyInfo.exists(_._1 == docsRows)) {
          Metrics.append(spark, root, runId, "dup_pairs",
            prevDup.get.rowCount, 0L, resumed = true)
          spark.read.parquet(dupDir)
        } else if (prevKeyInfo.isDefined && shardsFit && dupDirCommitted &&
                   doneDays.nonEmpty && doneDays.subsetOf(inDays.toSet)) {
          val t0 = System.nanoTime()
          // previous cluster assignment = the lane operators' union-find
          // seed (sound merge-emit; see Lsh.seedUnion). Read lazily — the
          // clusters stage only overwrites this dir AFTER the append loop.
          val clustersSeed: Option[DataFrame] = {
            val cp = new Path(s"$root/clusters/_SUCCESS")
            if (cp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(cp) &&
                Checkpoint.readManifest(spark, root, "clusters")
                  .exists(_.configHash.startsWith(cfg.configHash)))
              Some(spark.read.parquet(s"$root/clusters").select("doc_id", "cluster_id"))
            else None
          }
          var ctx = inDays.filter(doneDays.contains)
          // The lane seed is REFRESHED with an incremental-CC pass so it
          // covers EVERY pair emitted so far — day d+1's seeded lanes then
          // cannot re-merge (and so re-emit) a link day d already wrote,
          // keeping dup_pairs day partitions duplicate-free
          // (DayResumeSpec-asserted; the pre-r6 pre-append-snapshot seed
          // re-emitted drift links across partitions). Cost per refresh:
          // O(clusters + refreshed days' pairs) — the incremental-CC
          // bound. Superseded seed checkpoints are released once the next
          // one is eagerly materialized (the CC round-lifecycle lesson).
          var seedCkpt: Option[DataFrame] = None // the refresh we own blocks of
          var seed: Option[DataFrame] = clustersSeed
          def refreshSeed(days: Seq[java.sql.Timestamp]): Unit = if (days.nonEmpty) {
            val dayPairs = spark.read.parquet(dupDir)
              .where(col("warc_day").isin(days.map(x => x: Any): _*))
              .select("a", "b")
            val prevEdges = seed.map(pa =>
              pa.select(col("doc_id").as("a"), col("cluster_id").as("b")))
            val next = ConnectedComponents.assign(
                prevEdges.fold(dayPairs)(_.unionByName(dayPairs)))
              .localCheckpoint(true,
                org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
            seedCkpt.foreach { old =>
              old.queryExecution.analyzed.collectFirst {
                case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
              }.foreach(_.unpersist(blocking = false))
            }
            seedCkpt = Some(next)
            seed = Some(next)
          }
          // Crash-resume gap: a previous run may have appended day
          // partitions and died BEFORE its clusters rebuild — the committed
          // snapshot then does not cover those done days' pairs, and
          // seeding from it alone would let the first pending day re-emit
          // their links. The clusters manifest records which pair-days its
          // snapshot covers (dayListKey); refresh over the done days it
          // misses (all of them when no usable snapshot exists).
          val seedCovered: Set[java.sql.Timestamp] =
            if (clustersSeed.isEmpty) Set.empty
            else Checkpoint.readManifest(spark, root, "clusters").map(_.configHash)
              .filter(_.startsWith(s"${cfg.configHash}:pair_days="))
              .map(_.split("pair_days=")(1).split("\\+").filter(_.nonEmpty)
                .map(s => new java.sql.Timestamp(s.toLong)).toSet)
              .getOrElse(Set.empty)
          refreshSeed(ctx.filterNot(seedCovered.contains))
          pending.zipWithIndex.foreach { case (d, i) =>
            appendDayPairs(spark, root, runId, cfg, docs, shingled, signatures,
              bandKeysDay.get, seed, ctx, d, prevShards.get)
            ctx = ctx :+ d
            // not after the last day — the clusters stage rebuild covers it
            if (i < pending.size - 1) refreshSeed(Seq(d))
          }
          seedCkpt.foreach { old =>
            old.queryExecution.analyzed.collectFirst {
              case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
            }.foreach(_.unpersist(blocking = false))
          }
          val out = spark.read.parquet(dupDir)
          val wallMs = (System.nanoTime() - t0) / 1000000L
          Checkpoint.writeManifest(spark, root, Checkpoint.Manifest("dup_pairs",
            Checkpoint.stageKey(cfg, s"$inputKey;substr_shards=${prevShards.get}"),
            out.count(), wallMs))
          Metrics.append(spark, root, runId, "dup_pairs_incremental_days",
            pending.size.toLong, wallMs, resumed = false)
          out
        } else {
          val t0 = System.nanoTime()
          val dd = docs.select(col("doc_id"), col("warc_day"))
          val stamped = buildAllPairs()
            .join(dd.select(col("doc_id").as("a"), col("warc_day").as("da")), "a")
            .join(dd.select(col("doc_id").as("b"), col("warc_day").as("db")), "b")
            .withColumn("warc_day", greatest(col("da"), col("db")))
            .select("a", "b", "family", "warc_day")
          stamped.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .partitionBy("warc_day").parquet(dupDir)
          val out = spark.read.parquet(dupDir)
          val rows = out.count()
          val wallMs = (System.nanoTime() - t0) / 1000000L
          Checkpoint.writeManifest(spark, root,
            Checkpoint.Manifest("dup_pairs", dupKey, rows, wallMs))
          Metrics.append(spark, root, runId, "dup_pairs", rows, wallMs, resumed = false)
          // every input day is now covered — zero-pair days included, or
          // the append gate would reprocess them forever
          val perDay = out.groupBy("warc_day").count().collect()
            .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
          Lineage.appendDays(spark, root, runId, "dup_pairs", cfg.configHash,
            inDays.map(d => d -> perDay.getOrElse(d, 0L)))
          pairMetricsAfterBuild()
          out
        }
      }

    val clustersOut = if (!dayGranular) {
      Checkpoint.stage(spark, root, "clusters", cfg, runId, inputKey) {
        ConnectedComponents.clusters(
          ConnectedComponents.assign(dupPairs.select("a", "b")))
      }
    } else {
      // Clusters manifest key encodes WHICH pair-days the snapshot covers:
      // an append run finds its predecessor covering a strict subset and
      // rebuilds incrementally — CC over the previous assignment's
      // contracted star edges (cluster_id IS a member doc_id, so those
      // rows span every prior component) ∪ only the NEW days' pairs. Cost
      // per append: O(clusters + new pairs), not O(total pair history) —
      // the same bound the streaming bridge's incremental CC runs at. A
      // crashed predecessor (pairs appended, clusters stale) parses as a
      // smaller covered set and still rebuilds from exactly the missing
      // days' pairs.
      // raw epoch MILLIS per day, not /86400000: the division assumes UTC
      // midnights, and a non-UTC session's local midnights would truncate
      // to the wrong day — the incremental branch would then silently
      // never trigger (the parse could not reconstruct the real
      // timestamps). Raw millis round-trip identically in any timezone.
      def dayListKey(days: Seq[java.sql.Timestamp]): String =
        "pair_days=" + days.map(_.getTime).sorted.mkString("+")
      // torn-dir gate, same rationale as dup_pairs: a clusters Overwrite
      // that crashed mid-write leaves no _SUCCESS — reading the partial
      // dir as the previous assignment would silently drop components
      val clustersCommitted = new Path(s"$root/clusters/_SUCCESS")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new Path(s"$root/clusters/_SUCCESS"))
      val prevCovered: Option[Set[java.sql.Timestamp]] =
        Checkpoint.readManifest(spark, root, "clusters").map(_.configHash)
          .filter(_ => clustersCommitted)
          .filter(_.startsWith(s"${cfg.configHash}:pair_days="))
          .map(_.split("pair_days=")(1).split("\\+").filter(_.nonEmpty)
            .map(s => new java.sql.Timestamp(s.toLong)).toSet)
      Checkpoint.stage(spark, root, "clusters", cfg, runId, dayListKey(inDays)) {
        prevCovered match {
          case Some(cov) if cov.nonEmpty && cov.subsetOf(inDays.toSet) =>
            // eager: the stage write overwrites the dir being read
            val prevEdges = spark.read.parquet(s"$root/clusters")
              .select(col("doc_id").as("a"), col("cluster_id").as("b"))
              .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
            val newDays = inDays.filterNot(cov.contains)
            val newPairs = dupPairs
              .where(col("warc_day").isin(newDays.map(x => x: Any): _*))
              .select("a", "b")
            ConnectedComponents.clusters(
              ConnectedComponents.assign(prevEdges.unionByName(newPairs)))
          case _ =>
            ConnectedComponents.clusters(
              ConnectedComponents.assign(dupPairs.select("a", "b")))
        }
      }
    }

    keepBest.foreach { scoreExpr =>
      // key = clusters' own (already input+day-discriminating) manifest key
      // + the score expression, both hashed (a raw SQL expression would
      // break the flat-JSON manifest parser)
      val clusterKey = Checkpoint.readManifest(spark, root, "clusters")
        .map(_.configHash).getOrElse("")
      Checkpoint.stage(spark, root, "deduped", cfg, runId,
        s"clusters=${md5(clusterKey)};score=${md5(scoreExpr)}") {
        graft.Dedup.keepBest(docs,
          clustersOut.select("doc_id", "cluster_id"), expr(scoreExpr))
      }
    }
    clustersOut
  }

  /** One pending crawl day of the incremental pair build: new×all
    * candidates per family (minhash/simhash band keys read from the
    * PERSISTED band_keys stage — partition-pruned scans, zero key
    * re-derivation for the old corpus; substring via the gram new×all
    * route + new-docs suffix-array shards), verify joins
    * candidate-restricted, and the day's pairs written into their own
    * partition with dynamic overwrite — a torn day is recomputed and
    * overwrites itself, never double-appends. Lineage marks the day done
    * under the bare configHash. */
  private def appendDayPairs(spark: SparkSession, root: String, runId: String,
                             cfg: DedupConfig, docs: DataFrame, shingled: DataFrame,
                             signatures: DataFrame, bandKeys: DataFrame,
                             clustersSeed: Option[DataFrame],
                             ctxDays: Seq[java.sql.Timestamp],
                             d: java.sql.Timestamp, substrShards: Int): Unit = {
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val t0 = System.nanoTime()
    // loud-cap accounting for the appended day (estimates, counted by the
    // hot censuses of all three routes — never silent)
    val daySuppressed = spark.sparkContext.longAccumulator("append_suppressed_pairs")
    val isNew = col("warc_day") === lit(d)
    val isOld = col("warc_day").isin(ctxDays.map(x => x: Any): _*)
    val sigsAll = signatures.where(isNew || isOld)
    val shAll = shingled.where(isNew || isOld)
    // band keys come from storage on BOTH sides (r4 re-derived and block-
    // cached corpus×52 keys from signatures per appended day — measured
    // ~80% of the append wall); each leg of the new×all operator re-scans
    // the day-pruned, key-bucketed table instead of caching it
    def keys(side: org.apache.spark.sql.Column, fam: String) =
      bandKeys.where(side && col("family") === fam).select("doc_id", "key")
    // cap = saltMaxBucket for BOTH families: below it the new×all listing
    // is exact (same pair set as the batch path's cold cliques restricted
    // to new-involving pairs); above it, the census-salted lanes use the
    // IDENTICAL salt formula as the batch build and are resolved in-task
    // by the family's exact-verified forest — no unverified edge anywhere
    // (a pairStarCap hub star here split clusters at 240k; r4's hub
    // spokes were the same class). Touched-lane merges are usually
    // new-involving but NOT exclusively: a lane may expose an old↔old
    // drift link (census growth co-locating a pair no earlier lane saw),
    // emitted deliberately (added true connectivity). The caller refreshes
    // the seed between pending days, so a link emitted in day k can never
    // re-merge — and so never re-emit — in day k+1 (Lsh.seedUnion
    // documents the soundness argument).
    val (mhCold, mhLanes) = Lsh.newVsAllListing(
      keys(isNew, "minhash"), keys(isOld, "minhash"), cfg.saltMaxBucket,
      Some(daySuppressed))
    val (shCold, shLanes) = Lsh.newVsAllListing(
      keys(isNew, "simhash"), keys(isOld, "simhash"), cfg.saltMaxBucket,
      Some(daySuppressed))
    val mhc = mhCold.distinct().localCheckpoint(false, ser)
    val shc = shCold.distinct().localCheckpoint(false, ser)
    // lane payloads join from the doc_id-bucketed stage tables, seeded
    // with the previous cluster assignment; emitted lane edges are
    // ALREADY exact-verified (bypass the verify joins)
    val mhLaneV = Lsh.jaccardIncrementalLanePairs(
        Lsh.withLaneSeeds(mhLanes, clustersSeed)
          .join(shAll.select("doc_id", "shingles"), "doc_id"),
        cfg.jaccardThreshold, Some(daySuppressed))
      .localCheckpoint(false, ser)
    val shLaneV = Lsh.hammingIncrementalLanePairs(
        Lsh.withLaneSeeds(shLanes, clustersSeed)
          .join(sigsAll.select("doc_id", "simhash"), "doc_id"),
        cfg.hammingThreshold, Some(daySuppressed))
      .localCheckpoint(false, ser)
    val sub = ExactSubstr.substrDupPairsIncremental(
        docs.where(isNew), docs.where(isOld), cfg, substrShards,
        Some(daySuppressed))
      .localCheckpoint(false, ser)
    // one union action: the families overlap, counts gate the verify
    // restriction — the full-build discipline at day scale
    val famCounts = mhc.select(lit("mh").as("fam"))
      .unionByName(shc.select(lit("sh").as("fam")))
      .unionByName(mhLaneV.select(lit("mhv").as("fam")))
      .unionByName(shLaneV.select(lit("shv").as("fam")))
      .unionByName(sub.select(lit("sub").as("fam")))
      .groupBy("fam").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (nMh, nSh) = (famCounts.getOrElse("mh", 0L), famCounts.getOrElse("sh", 0L))
    val mh = Lsh.verifyJaccard(
        mhc, Lsh.restrictToCandidateDocs(
          shAll.select("doc_id", "shingles"), mhc, 2 * nMh), cfg)
      .select("a", "b").unionByName(mhLaneV)
    val sh = Lsh.verifyHamming(
        shc, Lsh.restrictToCandidateDocs(
          sigsAll.select("doc_id", "simhash"), shc, 2 * nSh), cfg)
      .select("a", "b").unionByName(shLaneV)
    Lsh.dupPairs(mh, sh, sub)
      .withColumn("warc_day", lit(d))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("warc_day").parquet(s"$root/dup_pairs")
    val n = spark.read.parquet(s"$root/dup_pairs").where(isNew).count()
    val wallMs = (System.nanoTime() - t0) / 1000000L
    Metrics.append(spark, root, runId, "dup_pairs_day", n, wallMs, resumed = false)
    Metrics.append(spark, root, runId, "append_suppressed_pairs_day",
      daySuppressed.value, 0L, resumed = false)
    Lineage.appendDays(spark, root, runId, "dup_pairs", cfg.configHash, Seq(d -> n))
    Seq(mhc, shc, mhLaneV, shLaneV, sub).foreach { df =>
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(blocking = false))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: DedupMain <input> <outRoot> [k=..] [bands=..] [keepBest=<sql-expr>] ...")
    val (inputRef, root) = (args(0), args(1))
    // keepBest is a RUN policy (which copy to keep), not a clustering knob:
    // it must not perturb configHash, so it is split off before parseConfig
    val (kbArgs, cfgArgs) = args.drop(2).partition(_.startsWith("keepBest="))
    val keepBest = kbArgs.lastOption.map(_.split("=", 2)(1))
    val cfg = parseConfig(cfgArgs.toSeq)
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
    val clusters = run(spark, inputRef, root, cfg, keepBest = keepBest)
    val nClusters = clusters.select("cluster_id").distinct().count()
    val nDocs = clusters.count()
    val dedupedField = keepBest.map { _ =>
      s""","deduped_docs":${spark.read.parquet(s"$root/deduped").count()}"""
    }.getOrElse("")
    println(s"""{"configHash":"${cfg.configHash}","clustered_docs":$nDocs,"clusters":$nClusters$dedupedField,"out":"$root"}""")
    spark.stop()
  }
}
