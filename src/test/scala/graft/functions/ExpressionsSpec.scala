package graft.functions

import graft.{DedupConfig, SparkSuite}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSuite {
  import spark.implicits._
  private val cfg = DedupConfig.test

  test("Mersenne61.mulAdd matches BigInt arithmetic") {
    val rnd = new java.util.SplittableRandom(7)
    val P = BigInt(Mersenne61.P)
    (1 to 2000).foreach { _ =>
      val a = rnd.nextLong(1, Mersenne61.P)
      val h = rnd.nextLong(0, Mersenne61.P)
      val b = rnd.nextLong(0, Mersenne61.P)
      val expect = ((BigInt(a) * BigInt(h) + BigInt(b)) mod P).toLong
      assert(Mersenne61.mulAdd(a, h, b) === expect, s"a=$a h=$h b=$b")
    }
  }

  test("Mersenne61.reduce64 matches BigInt for arbitrary 64-bit input") {
    val rnd = new java.util.SplittableRandom(8)
    (1 to 2000).foreach { _ =>
      val x = rnd.nextLong()
      val unsigned = BigInt(x & Long.MaxValue) + (if (x < 0) BigInt(2).pow(63) else BigInt(0))
      assert(Mersenne61.reduce64(x) === unsigned.mod(BigInt(Mersenne61.P)).toLong, s"x=$x")
    }
  }

  test("ShingleHashes equals builtin xxhash64-over-joined-kgrams composition") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c",
      "a b",                       // fewer than k tokens -> empty
      "one two three two one two three", // repeated shingles -> distinct
      "  leading and  double  spaces trailing ",
      "unicode héllo wörld ünïcode tokens here",
      "中文 分词 测试 中文 分词")
    val df = texts.toDF("text")
    // builtin reference: k-grams over the space-filtered token array
    val toks = filter(split(col("text"), " "), w => length(w) > 0)
    val ref = df.select(
      when(size(toks) < cfg.k, array().cast("array<bigint>"))
        .otherwise(array_sort(array_distinct(transform(
          sequence(lit(1), size(toks) - (cfg.k - 1)),
          i => xxhash64(concat_ws(" ", slice(toks, i, lit(cfg.k)))))))).as("ref"))
      .collect().map(_.getSeq[Long](0))
    // builtin xxhash64 pins seed=42, so compare at that seed
    val got = df.select(Fns.shingleHashes(col("text"), "word", cfg.k, 42L).as("got"))
      .collect().map(_.getSeq[Long](0))
    texts.indices.foreach { i =>
      assert(got(i) === ref(i), s"text='${texts(i)}'")
    }
    // and a different seed must change the hash family
    val other = df.select(Fns.shingleHashes(col("text"), cfg)).collect().map(_.getSeq[Long](0))
    assert(other(0) !== got(0))
  }

  test("ShingleHashes: fewer than k tokens yields empty; char unit works") {
    val out = Seq("one two").toDF("text")
      .select(Fns.shingleHashes(col("text"), cfg)).as[Seq[Long]].head()
    assert(out.isEmpty)
    val ch = Seq("abcd").toDF("text")
      .select(Fns.shingleHashes(col("text"), "char", 3, cfg.seed)).as[Seq[Long]].head()
    assert(ch.length === 2) // "abc", "bcd"
  }

  test("MinHashSig is deterministic, permutation-count sized, order-insensitive") {
    val sig = Seq((1L, Array(3L, 9L, 27L)), (2L, Array(27L, 3L, 9L)))
      .toDF("id", "sh")
      .select(Fns.minhashSig(array_sort(col("sh")), cfg).as("sig"))
      .as[Seq[Long]].collect()
    assert(sig(0).length === cfg.numPerm)
    assert(sig(0) === sig(1))
  }

  test("MinHash Jaccard estimate concentrates near exact Jaccard") {
    // two sets with known overlap: |A∩B|=80, |A∪B|=120 -> J=2/3
    val a = (1 to 100).map(_.toLong).toArray
    val b = (21 to 140).map(_.toLong).toArray.take(100)
    val df = Seq(("a", a), ("b", b)).toDF("id", "sh")
      .select(col("id"), Fns.minhashSig(array_sort(col("sh")), cfg).as("sig"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val est = m("a").zip(m("b")).count { case (x, y) => x == y }.toDouble / cfg.numPerm
    val exact = 80.0 / 120.0
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact") // 128 perms: σ≈0.042
  }

  test("SimHash64 is a pure bag-of-words function (order invariant)") {
    val df = Seq(
      "alpha beta gamma delta epsilon zeta",
      "zeta epsilon delta gamma beta alpha").toDF("text")
      .select(Fns.simhash64(col("text"), cfg).as("h")).as[Long].collect()
    assert(df(0) === df(1))
  }

  test("SimHash64: small edits stay within small Hamming distance") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val edited = ((1 to 60).map(i => s"tok$i") :+ "extra").mkString(" ")
    val Seq(h1, h2) = Seq(base, edited).toDF("text")
      .select(Fns.simhash64(col("text"), cfg)).as[Long].collect().toSeq
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 8)
  }

  test("JaccardSorted equals builtin array_intersect/array_union sizes") {
    val rnd = new java.util.SplittableRandom(9)
    val rows = (1 to 50).map { _ =>
      val a = Array.fill(rnd.nextInt(0, 40))(rnd.nextLong(0, 50)).distinct.sorted
      val b = Array.fill(rnd.nextInt(1, 40))(rnd.nextLong(0, 50)).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(Fns.jaccardSorted(col("a"), col("b"))).as[Option[Double]].collect()
    val ref = df.select(
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b"))))).as[Option[Double]].collect()
    got.zip(ref).zip(rows).foreach { case ((g, r), (a, b)) =>
      val expected = if (a.isEmpty && b.isEmpty) None else r
      assert(g === expected, s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("CosineSim matches direct double computation") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(Fns.cosineSim(col("a"), col("b"))).as[Double].head()
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val expect = dot / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
    assert(got === expect)
  }
}
