package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Pure-Scala text hashing / sketching kernels, shared by the dedup
  * operators' typed (Dataset) stages.
  *
  * Why typed stages and not SQL expressions: computed-column pipelines
  * feeding `explode` get inlined by Catalyst (`InferFiltersFromGenerate`
  * + `CollapseProject` + predicate pushdown) into scan-level Filters
  * that re-evaluate the entire expression several times per row — at
  * sf0.1 that turned a 2 s signature job into minutes. A typed map is a
  * SerializeFromObject boundary the optimizer cannot substitute
  * through, and the tight JVM loops here are ~100× faster than
  * interpreted higher-order-function lambdas anyway.
  *
  * Every definition mirrors the DuckDB oracle SQL exactly:
  * tokens = string_split(lower(text), ' '); shingles = distinct 3-word
  * windows; h32 = first 8 hex chars of md5 as an integer.
  */
object TextHash {

  def tokens(text: String): Array[String] =
    text.toLowerCase.split(" ", -1)

  def shingles(text: String): Array[String] = {
    val ws = tokens(text)
    if (ws.length < 3) Array.empty[String]
    else ws.sliding(3).map(_.mkString(" ")).toArray.distinct
  }

  /** First 8 md5 hex chars as an unsigned 32-bit value (matches
    * `CAST(conv(substr(md5(s),1,8),16,10) AS BIGINT)` /
    * `('0x'||substr(md5(s),1,8))::UBIGINT`). */
  def h32(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** MinHash universal-hash family: (a_i*h + b_i) mod p, p prime >
    * 2^32, a < 2^31 so a*h stays under 2^63. Fixed-seed LCG keeps
    * signatures reproducible. */
  val P = 4294967311L
  val NumHashes = 128
  val BandRows = 4
  val NumBands: Int = NumHashes / BandRows
  val hashParams: IndexedSeq[(Long, Long)] = {
    var x = 42L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    (0 until NumHashes).map { _ =>
      val a = (math.abs(next()) % (Int.MaxValue.toLong - 1)) + 1
      val b = math.abs(next()) % P
      (a, b)
    }
  }

  def minhashSig(hs: Array[Long]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < NumHashes) {
      val (a, b) = hashParams(i)
      var m = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = (a * hs(j) + b) % P
        if (v < m) m = v
        j += 1
      }
      sig(i) = m
      i += 1
    }
    sig
  }

  /** LSH bucket keys: one per band of BandRows signature values. */
  def minhashBands(hs: Array[Long]): Seq[String] = {
    val sig = minhashSig(hs)
    (0 until NumBands).map { bd =>
      val sb = new StringBuilder
      sb.append(bd)
      var j = 0
      while (j < BandRows) {
        sb.append('-').append(sig(bd * BandRows + j))
        j += 1
      }
      sb.toString
    }
  }

  /** 32-bit SimHash: bit b set iff the majority of element hashes have
    * bit b set (strict majority; ties clear — matches the oracle). */
  def simhash32(hs: Array[Long]): Long = {
    val votes = new Array[Int](32)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
