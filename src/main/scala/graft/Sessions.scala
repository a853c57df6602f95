package graft

import org.apache.spark.sql.SparkSession

/** C1 — canonical session builder (SURVEY.md §2.0): AQE + skew-join on,
  * shuffle partitions sized to cores, UTC, Encoders only (no Kryo config —
  * everything on the wire is Tungsten rows). `spark-submit` deployments
  * keep their submitted master/conf; local callers get local[cores]. */
object Sessions {
  def builder(cores: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)

  def local(cores: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = builder(cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
