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
    // a failed query must NOT masquerade as an ordinary timing: record -1
    // for it and list it under "errors" in the JSON
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var failed = false
      val sec = (1 to reps).map { _ =>
        time { try fn(spark, sfDir).count() catch { case _: Throwable => failed = true } }
      }.min
      if (failed) errors += name
      name -> (if (failed) -1.0 else sec)
    }

    // headline: full EAC pipeline (all 3 families -> clusters), docs/sec
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val pipelineSec = (1 to reps).map { _ =>
      time { SparkEntry.queries("q22_eac_clusters")(spark, sfDir).count() }
    }.min
    val docsPerSec = docs / pipelineSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir",""" +
      s""""cpus":$cpus,"docs":$docs,"pipeline_sec":$pipelineSec,"docs_per_sec":$docsPerSec}""")
    spark.stop()
  }
}
