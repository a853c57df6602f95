package graft

import graft.operators.{ConnectedComponents, Lsh}
import graft.sources.TestData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is one implemented operator (SURVEY.md §2); each
  * SQL-expressible one has a DuckDB oracle in `oracleSql` with *identical
  * output column names* and deterministic ORDER BY on both sides.
  */
object SparkEntry {
  private val cfg = DedupConfig.test

  private def docs(spark: SparkSession, dir: String): DataFrame =
    TestData.documents(spark, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full MinHash-LSH near-dup pipeline down to verified pairs. */
  def entry(spark: SparkSession): DataFrame =
    Lsh.minhashDupPairs(docs(spark, "/root/testdata/sf0.001"), cfg)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 — hash aggregate over the corpus (op A1, SRC2).
    "q01_doc_stats" -> ((s, dir) =>
      docs(s, dir).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("lang")),

    // S1 — shingler: per-doc distinct word-3-shingle count.
    "q02_shingles" -> ((s, dir) =>
      Lsh.shingled(docs(s, dir), cfg)
        .select(col("doc_id"), size(col("shingles")).cast("long").as("n_shingles"))
        .orderBy("doc_id")),

    // S1+M1+B1+B3+J1+V1 — full MinHash LSH family: verified dup pairs.
    "q03_dup_pairs_minhash" -> ((s, dir) =>
      Lsh.minhashDupPairs(docs(s, dir), cfg).orderBy("a", "b")),

    // G1–G4 — connected components over the verified pairs.
    "q04_clusters" -> ((s, dir) =>
      ConnectedComponents.assign(Lsh.minhashDupPairs(docs(s, dir), cfg))
        .orderBy("doc_id")),

    // G5+A4 — cluster sizes, largest first.
    "q05_cluster_sizes" -> ((s, dir) =>
      ConnectedComponents.assign(Lsh.minhashDupPairs(docs(s, dir), cfg))
        .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
        .orderBy(desc("cluster_size"), col("cluster_id"))),
  )

  /** Shared DuckDB SQL fragment: distinct word-3-shingle sets per doc. */
  private val shingleSetsSql =
    "SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] " +
      "for i in range(1, len(w)-1)]) AS s " +
      "FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)"

  /** Brute-force exact-Jaccard pairs at the configured threshold — the
    * oracle the LSH pipeline must reproduce (recall bar, BASELINE.json:2). */
  private val brutePairsSql =
    s"""WITH sh AS ($shingleSetsSql)
       |SELECT x.doc_id AS a, y.doc_id AS b,
       |       len(list_intersect(x.s, y.s)) / len(list_distinct(x.s || y.s)) AS jaccard
       |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
       |WHERE len(list_intersect(x.s, y.s)) / len(list_distinct(x.s || y.s)) >= ${cfg.jaccardThreshold}""".stripMargin

  /** Connected components of the brute-force pair graph via recursive CTE:
    * (doc_id, cluster_id = min reachable doc_id). */
  private val bruteClustersSql =
    s"""WITH RECURSIVE sh AS ($shingleSetsSql),
       |pairs AS (SELECT a, b FROM ($brutePairsSql)),
       |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
       |reach(n, m) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
       |)
       |SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q01_doc_stats" ->
      ("SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "q02_shingles" ->
      s"WITH sh AS ($shingleSetsSql) SELECT doc_id, len(s) AS n_shingles FROM sh ORDER BY doc_id",
    "q03_dup_pairs_minhash" -> (brutePairsSql + " ORDER BY a, b"),
    "q04_clusters" -> (bruteClustersSql + " ORDER BY doc_id"),
    "q05_cluster_sizes" ->
      s"""SELECT cluster_id, count(*) AS cluster_size FROM ($bruteClustersSql)
         |GROUP BY cluster_id ORDER BY cluster_size DESC, cluster_id""".stripMargin,
  )
}
