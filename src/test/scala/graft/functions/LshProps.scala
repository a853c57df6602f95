package graft.functions

import graft.DedupConfig
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/**
 * ScalaCheck property suites (SURVEY.md §5.1 layer 3) over the pure
 * function cores — no SparkSession needed, so these run fast and wide.
 */
object LshProps extends Properties("graft.lsh") {
  private val cfg = DedupConfig.test

  private def shingleSet(toks: Seq[String], k: Int): Set[String] =
    if (toks.length < k) Set.empty
    else toks.sliding(k).map(_.mkString(" ")).toSet

  private def hashSet(toks: Seq[String], k: Int): Array[Long] =
    shingleSet(toks, k).map(s => Xxh.hashString(s, cfg.seed)).toArray.sorted

  private def minhash(sh: Array[Long]): Array[Long] = {
    val (as, bs) = MinHashSig.params(cfg.numPerm, cfg.seed)
    val acc = Array.fill(cfg.numPerm)(Long.MaxValue)
    sh.foreach { h0 =>
      val h = Mersenne61.reduce64(h0)
      var i = 0
      while (i < cfg.numPerm) {
        val v = Mersenne61.mulAdd(as(i), h, bs(i))
        if (v < acc(i)) acc(i) = v
        i += 1
      }
    }
    acc
  }

  private val token: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi")
  private val doc: Gen[List[String]] = Gen.listOfN(40, token)

  property("minhash agreement estimates Jaccard within 4 sigma") = Prop.forAll(doc, doc) { (a, b) =>
    val (sa, sb) = (hashSet(a, cfg.k), hashSet(b, cfg.k))
    (sa.nonEmpty && sb.nonEmpty) ==> {
      val inter = sa.intersect(sb).length
      val union = sa.length + sb.length - inter
      val j = inter.toDouble / union
      val est = minhash(sa).zip(minhash(sb)).count { case (x, y) => x == y }.toDouble / cfg.numPerm
      val sigma = math.sqrt(j * (1 - j) / cfg.numPerm) + 1e-9
      math.abs(est - j) <= 4 * sigma + 0.02
    }
  }

  property("permutation invariance: shingle ORDER never changes the signature") =
    Prop.forAll(doc) { a =>
      val sh = hashSet(a, cfg.k)
      sh.nonEmpty ==> {
        val shuffled = scala.util.Random.shuffle(sh.toList).toArray
        minhash(sh).sameElements(minhash(shuffled))
      }
    }

  property("hamming pigeonhole: d<=t flips leave >=1 block-combination key equal") =
    Prop.forAll(Gen.long, Gen.choose(0, cfg.hammingThreshold),
                Gen.listOf(Gen.choose(0, 63))) { (fp, nf, bits) =>
      val flips = bits.distinct.take(nf)
      val fp2 = flips.foldLeft(fp)((v, b) => v ^ (1L << b))
      val nb = cfg.simhashBlocks
      val base = 64 / nb
      val extra = 64 % nb
      val widths = Array.tabulate(nb)(i => base + (if (i < extra) 1 else 0))
      val offsets = widths.scanLeft(0)(_ + _)
      def blocks(v: Long) = (0 until nb).map(i => (v >>> offsets(i)) & ((1L << widths(i)) - 1))
      val same = blocks(fp).zip(blocks(fp2)).count { case (x, y) => x == y }
      // any combination of (nb - t) blocks: at least one is fully clean
      same >= nb - cfg.hammingThreshold
    }

  property("winnowing: every window of w gram positions has a selection") =
    Prop.forAll(Gen.listOfN(120, Gen.long), Gen.choose(2, 20)) { (hs, w) =>
      val arr = hs.toArray
      val sel = graft.operators.ExactSubstr.winnowPositions(arr, w)
      (0 to arr.length - w).forall(s => sel.exists(p => p >= s && p < s + w))
    }

  property("jaccard merge-intersect equals set arithmetic") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, 50L)), Gen.listOf(Gen.choose(0L, 50L))) { (a, b) =>
      val (sa, sb) = (a.distinct.sorted.toArray, b.distinct.sorted.toArray)
      var i = 0; var j = 0; var inter = 0
      while (i < sa.length && j < sb.length) {
        if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
        else if (sa(i) < sb(j)) i += 1 else j += 1
      }
      val expect = a.toSet.intersect(b.toSet).size
      inter == expect
    }
}
