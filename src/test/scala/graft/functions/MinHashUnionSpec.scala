package graft.functions

import graft.{DedupConfig, SparkSuite}
import org.apache.spark.sql.functions._

class MinHashUnionSpec extends SparkSuite {
  import spark.implicits._
  private val cfg = DedupConfig.test

  test("union of signatures == signature of the set union (MinHash property)") {
    val a = (1L to 100L).toArray
    val b = (60L to 180L).toArray
    val df = Seq(("g", a), ("g", b)).toDF("g", "sh")
      .select(col("g"), Fns.minhashSig(array_sort(col("sh")), cfg).as("sig"))
    val union = udaf(MinHashUnion)
    val merged = df.groupBy("g")
      .agg(union(col("sig")).as("u"))
      .select("u").as[Seq[Long]].head()
    val direct = Seq(("u", (a ++ b).distinct.sorted)).toDF("g", "sh")
      .select(Fns.minhashSig(col("sh"), cfg)).as[Seq[Long]].head()
    assert(merged === direct)
  }

  test("empty buffer is an identity") {
    assert(MinHashUnion.merge(Array.emptyLongArray, Array(5L, 6L)).toSeq === Seq(5L, 6L))
    assert(MinHashUnion.merge(Array(5L, 6L), Array.emptyLongArray).toSeq === Seq(5L, 6L))
  }
}
