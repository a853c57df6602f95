package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/**
 * Arithmetic over the Mersenne prime p = 2^61 - 1, used by the batched
 * MinHash permutation family h_i(x) = (a_i * x + b_i) mod p  [Broder97;
 * MMDS ch.3]. All values kept in [0, p), so signed 64-bit comparison is
 * safe. 128-bit products are reduced with the identities
 * 2^61 ≡ 1 (mod p) and 2^64 ≡ 8 (mod p).
 */
object Mersenne61 {
  final val P: Long = (1L << 61) - 1

  /** Reduce an arbitrary (unsigned) 64-bit value into [0, P). */
  @inline def reduce64(x: Long): Long = {
    // x = hi3 * 2^61 + lo61  ⇒  x ≡ hi3 + lo61; hi3 ≤ 7 so one pass + fixup.
    var r = (x >>> 61) + (x & P)
    if (r >= P) r -= P
    r
  }

  /** (a * h + b) mod P for a, b, h ∈ [0, P). */
  @inline def mulAdd(a: Long, h: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, h) // a,h < 2^61 ⇒ product < 2^122, hi < 2^58
    val lo = a * h
    // a*h = hi*2^64 + lo ≡ 8*hi + (lo>>>61) + (lo & P); each term < 2^61.
    var r = (hi << 3) + (lo >>> 61) + (lo & P) // < 3 * 2^61 < 2^63: no overflow
    r = (r >>> 61) + (r & P)
    r += b
    r = (r >>> 61) + (r & P)
    if (r >= P) r -= P
    r
  }
}

/** Thin wrappers around Spark's own XXH64 so our typed/eval code paths hash
  * byte-identically to the builtin `xxhash64` SQL function (seed 42). */
object Xxh {
  final val SparkDefaultSeed = 42L

  @inline def hashBytes(bytes: Array[Byte], from: Int, len: Int, seed: Long): Long =
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, len, seed)

  @inline def hashBytes(bytes: Array[Byte], seed: Long): Long =
    hashBytes(bytes, 0, bytes.length, seed)

  @inline def hashString(s: String, seed: Long): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  @inline def hashLong(v: Long, seed: Long): Long = XXH64.hashLong(v, seed)
}
