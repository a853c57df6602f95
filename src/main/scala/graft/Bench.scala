package graft

import org.apache.spark.sql.SparkSession

/**
 * Driver-run benchmark harness: times every SparkEntry query at
 * SPARK_GRAFT_SF_DIR under local[SPARK_GRAFT_CPUS] and prints ONE JSON
 * line (driver contract keys metric/value/unit/queries/sf, plus extra
 * informational keys: cpus, docs, pipeline_sec, docs_per_sec — the
 * headline dedup-throughput number is the full three-family EAC pipeline
 * from raw documents to clusters, docs / pipeline_sec).
 *
 * Scaling protocol (BENCH/BASELINE.md): run twice with SPARK_GRAFT_CPUS=8
 * and 32 on the same input; efficiency = (T8 / T32) / 4.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shuffle on tmpfs when available (local[N] shares one disk across all
    // N task threads; a real cluster has local disks per executor)
    val localDir =
      if (new java.io.File("/dev/shm").isDirectory) {
        val d = new java.io.File("/dev/shm/graft-shuffle")
        d.mkdirs(); d.getAbsolutePath
      } else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/page-cache warmup on the smallest query, excluded from timings
    try SparkEntry.queries("q01_doc_stats")(spark, sfDir).count() catch { case _: Throwable => }

    // min-of-k per query (SPARK_GRAFT_REPS, default 2): single-rep walls
    // measure host weather as much as code — min-of-k is the standard
    // noise-robust throughput protocol (BENCH/BASELINE.md)
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    // Failures tracked PER REP: a query is an error only when EVERY rep
    // failed (a transient rep failure must not discard the successful
    // reps' timing), and the min is taken over successful reps only. A
    // query with no successful rep records -1 and lands under "errors".
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    def minOfK(f: => Unit): (Double, Seq[Double]) = {
      val walls = (1 to reps).flatMap { _ =>
        try Some(time(f)) catch { case _: Throwable => None }
      }
      (if (walls.isEmpty) -1.0 else walls.min, walls)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec, walls) = minOfK { fn(spark, sfDir).count() }
      if (walls.isEmpty) errors += name
      (name, sec, walls)
    }

    // headline: full EAC pipeline (all 3 families -> clusters), docs/sec
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val (pipelineSec, pipelineWalls) =
      minOfK { SparkEntry.queries("q22_eac_clusters")(spark, sfDir).count() }
    // the HEADLINE metric must fail as loudly as any per-query failure: an
    // all-reps-failed pipeline records -1 and lands under errors instead of
    // leaking a plausible-looking negative docs/sec into baselines
    if (pipelineWalls.isEmpty) errors += "pipeline(q22_eac_clusters)"
    val docsPerSec = if (pipelineWalls.isEmpty) -1.0 else docs / pipelineSec

    // self-bracketing: the host's thread-scaling ceiling in THIS window —
    // readers judge the walls above against ambient, not in a vacuum
    val burn = graft.tools.Burn.measure()

    // Locale.ROOT: a %-formatted double under a comma-decimal default
    // locale (de_DE) renders 1,234 — invalid inside hand-built JSON
    def arr(xs: Seq[Double]) =
      xs.map(w => "%.3f".formatLocal(java.util.Locale.ROOT, w)).mkString("[", ",", "]")
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val repJson = results.map { case (k, _, ws) => "\"" + k + "\":" + arr(ws) }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir",""" +
      s""""cpus":$cpus,"docs":$docs,"pipeline_sec":$pipelineSec,"docs_per_sec":$docsPerSec,""" +
      s""""pipeline_reps":${arr(pipelineWalls)},"reps":$repJson,${burn.json}}""")
    spark.stop()
  }
}
