package graft

/**
 * Frozen pipeline configuration (SURVEY.md §2 op C0).
 *
 * One immutable object pins every knob that affects cluster output, so
 * "same config ⇒ same clusters" is a meaningful, testable statement
 * (BASELINE.json:6 "identical shingle/band/row signature configs").
 * `configHash` keys lineage / checkpoint-resume (BASELINE.json:14).
 *
 * Defaults derived in SURVEY.md Appendix A:
 *  - b=32, r=4 (numPerm=128): P(candidate | J=0.8) = 1-(1-0.8^4)^32 ≈ 1-1e-7.3
 *  - simhashBlocks=6, hamming≤3: any pair within Hamming 3 of 64 bits agrees
 *    on ≥3 of 6 blocks ⇒ collides on ≥1 of the C(6,3)=20 block-combination
 *    keys (~32-bit keys — selective enough at 10^12 docs, unlike 16-bit
 *    quarters).
 *  - gramLen=100, winnowW=50: winnowing guarantees detection of exact
 *    repeats ≥ gramLen + winnowW - 1 = 149 bytes (SURVEY.md App A.3).
 *  - pairListMaxClique=64: star threshold for the substring family's PAIR
 *    ENUMERATION, deliberately lower than saltMaxBucket. saltMaxBucket
 *    bounds join/bucket task size (a memory/skew limit); this bounds the
 *    emitted pair-table size (an output-volume limit): a clique of n
 *    mutual substring dups emits O(n) star+chain pairs instead of C(n,2) —
 *    at 960k docs the sub-saltMaxBucket boilerplate cliques emitted 18.9M
 *    all-pairs rows, redundant for clustering (transitively connected).
 *    ≤0 falls back to saltMaxBucket (and to uncapped if that is ≤0 too).
 */
final case class DedupConfig(
    shingleUnit: String = "word", // "word" | "char" (char = byte k-grams)
    k: Int = 3,
    numPerm: Int = 128,
    bands: Int = 32,
    rows: Int = 4,
    jaccardThreshold: Double = 0.8,
    hammingThreshold: Int = 3,
    simhashBits: Int = 64,
    simhashBlocks: Int = 6,
    gramLen: Int = 100,
    winnowW: Int = 50,
    substrMinFrac: Double = 0.2,
    substrShards: Int = 64,
    pairListMaxClique: Int = 64,
    saltMaxBucket: Int = 1000,
    seed: Long = 0x5EAC15DL) {

  require(bands * rows == numPerm, s"bands($bands) * rows($rows) must equal numPerm($numPerm)")
  require(shingleUnit == "word" || shingleUnit == "char", s"bad shingleUnit $shingleUnit")
  require(simhashBlocks > hammingThreshold, "need more simhash blocks than tolerated bit flips")
  require(simhashBits == 64, "only 64-bit SimHash supported")

  /** Stable hash of every field; keys lineage rows and resume manifests. */
  lazy val configHash: String = {
    val repr = productIterator.mkString("DedupConfig(", "|", ")")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(repr.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}

object DedupConfig {
  /** Test/verify profile pinned in SURVEY.md §5.3. */
  val test: DedupConfig = DedupConfig()
}
