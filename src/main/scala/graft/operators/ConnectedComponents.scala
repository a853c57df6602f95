package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed connected components via alternating large-star / small-star
 * rounds [Kiveris14] (SURVEY.md §2.6, ops G1–G5). Pure DataFrame self-
 * aggregations — adjacency stays relational, no GraphX, no collect_set (a
 * window min per round instead, so high-degree nodes never materialize a
 * neighbor list on one task).
 *
 * Iteration discipline (op G4): `localCheckpoint` each round truncates the
 * lineage (plan trees otherwise grow exponentially); convergence is detected
 * by an order-insensitive (count, hash-sum) fingerprint of the edge set;
 * rounds are capped at 2·log2(n)+10 — large-star/small-star converges in
 * O(log n) rounds on any graph.
 */
object ConnectedComponents {

  /** One large-star round: every node's strictly-larger neighbors reattach
    * to the minimum of its closed neighborhood. */
  private[operators] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val w = Window.partitionBy("src")
    sym.withColumn("m", least(min("dst").over(w), col("src")))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
    // no distinct here: small-star dedupes right after; one less shuffle
    // per round (driver-synced rounds are the serial term in scaling)
  }

  /** One small-star round: every node and its smaller neighbors reattach to
    * the minimum of the smaller neighborhood. */
  private[operators] def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges
      .select(greatest(col("src"), col("dst")).as("src"),
              least(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
    val w = Window.partitionBy("src")
    val withMin = oriented.withColumn("m", min("dst").over(w))
    withMin.select(col("dst").as("src"), col("m").as("dst"))
      .union(withMin.select(col("src"), col("m").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
  }

  /** Order-insensitive fingerprint of the (distinct) edge set: row count
    * plus XOR of per-edge hashes — overflow-free under ANSI mode. */
  private def fingerprint(edges: DataFrame): (Long, Long) = {
    val row = edges.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("h")).head()
    (row.getLong(0), row.getLong(1))
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Every this-many rounds, the edge set is checkpointed *reliably* (to
    * `sparkContext.getCheckpointDir`, when one is set) instead of locally:
    * localCheckpoint blocks live on executors, so on a real cluster one
    * executor loss mid-iteration would kill the job unrecoverably (truncated
    * lineage can't recompute). SURVEY §4.3 discipline. */
  private val ReliableCheckpointEvery = 5

  /**
   * G1–G4: dup pairs (a, b) → component assignment (doc_id, cluster_id),
   * cluster_id = min doc_id of the component. Only nodes that appear in at
   * least one pair are emitted (singletons are not duplicates).
   */
  /** The RDD a checkpointed Dataset wraps (its analyzed plan is a
    * LogicalRDD) — the handle whose blocks the round lifecycle below
    * unpersists. Tracking the handle directly keeps the lifecycle scoped to
    * THIS iteration's own checkpoints: diffing the session-global
    * persistent-RDD registry (the pre-r3 approach) captured — and
    * unpersisted mid-flight — RDDs persisted by any concurrent job in the
    * same session (e.g. the streaming foreachBatch bridge). */
  private def checkpointedRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  def assign(pairs: DataFrame, maxRoundsHint: Option[Int] = None): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val reliable = sc.getCheckpointDir.isDefined
    // Checkpoint-block lifecycle: each round's edge blocks are only needed
    // until the NEXT round materializes — without explicit unpersist the
    // blocks of every round pile up until GC notices (at 10^7+ edges ×
    // O(log n) rounds that is an OOM, observed at 960k docs).
    var edges = pairs
      .select(col("a").as("src"), col("b").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var prevRdd = checkpointedRdd(edges)

    var (prevN, prevH) = fingerprint(edges)
    val maxRounds = maxRoundsHint.getOrElse(
      2 * (64 - java.lang.Long.numberOfLeadingZeros(math.max(prevN, 1L))) + 10)

    var round = 0
    var converged = prevN == 0
    while (!converged && round < maxRounds) {
      // lazy checkpoint: the fingerprint aggregation below is the action
      // that materializes it — one Spark job per round, not two (driver
      // round-trip latency is the serial term that caps scaling)
      val stepped = smallStar(largeStar(edges))
      val next =
        if (reliable && round % ReliableCheckpointEvery == ReliableCheckpointEvery - 1)
          stepped.checkpoint(false) // durable: survives executor loss
        else stepped.localCheckpoint(false)
      val (n, h) = fingerprint(next)
      // the successor is materialized — the previous round's blocks are dead
      prevRdd.foreach(_.unpersist(blocking = false))
      prevRdd = checkpointedRdd(next)
      converged = n == prevN && h == prevH
      prevN = n; prevH = h
      edges = next
      round += 1
    }
    if (!converged)
      log.warn(s"connected components did NOT converge in $maxRounds rounds " +
        s"($prevN edges at exit) — emitted clusters may be split; " +
        "raise maxRoundsHint or investigate the pair graph")

    // Converged forest is a star per component centered at the minimum:
    // every node's component is the min over its closed neighborhood.
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    sym.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src").as("doc_id"), least(col("mn"), col("src")).as("cluster_id"))
  }

  /** G5 — cluster table with size and canonical-representative flag
    * (canonical = smallest doc_id of the cluster). */
  def clusters(assignment: DataFrame): DataFrame = {
    val w = Window.partitionBy("cluster_id")
    assignment
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("is_canonical",
        row_number().over(w.orderBy("doc_id")) === 1)
  }
}
