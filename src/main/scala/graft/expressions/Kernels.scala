package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel bodies shared by the interpreted eval path and generated
  * code. `doGenCode` emits direct static calls to these methods, so stages
  * containing graft expressions stay inside whole-stage codegen (a
  * CodegenFallback expression would kick its whole stage out to
  * row-at-a-time interpretation).
  */
object Kernels {

  /** Per-thread MD5 instance: MessageDigest is stateful (reset + update),
    * and getInstance per token would dominate the hash itself. */
  private val md5TL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Little-endian uint64 of MD5 digest bytes 8..15 — bit-for-bit the
    * oracle engine's `md5_number_lower(tok)`, so the slot assignment is
    * recomputable in plain SQL on the oracle side. The sign bit is
    * digest byte 0's LSB = `md5_number_upper(tok) & 1`. MD5 here is a
    * deterministic mixer, not a security primitive. */
  private def md5Bytes(t: UTF8String): Array[Byte] = {
    val md = md5TL.get()
    md.reset()
    md.digest(t.getBytes)
  }

  private def md5Lower(d: Array[Byte]): Long = {
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v
  }

  /** md5_number_lower of a string — the shared cross-engine 64-bit mixer.
    * Public (not qualified-private): generated code calls it through the
    * object's STATIC FORWARDER, which scalac only emits for public
    * members — a private[graft] here compiles but breaks codegen at
    * runtime (silent fallback to interpreted predicates). */
  def md5LowerOf(s: UTF8String): Long = md5Lower(md5Bytes(s))

  /** md5_number_lower of a byte subrange (char-gram hashing without a
    * per-gram string allocation). */
  def md5LowerOfRange(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = md5TL.get()
    md.reset()
    md.update(bytes, off, len)
    md5Lower(md.digest())
  }

  /** Raw feature-hash slot counts (pre-normalization): counts(slot) =
    * (#tokens hashing there with +1 sign) − (#with −1). Integer-exact, so
    * every derived statistic an oracle recomputes from these counts is
    * free of float-summation-order concerns. */
  def featureHashCounts(toks: ArrayData, dim: Int): ArrayData = {
    val acc = new Array[Long](dim)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        if (t.numBytes > 0) { // empty tokens (e.g. split of "") carry no signal
          val d = md5Bytes(t)
          val idx = java.lang.Long.remainderUnsigned(md5Lower(d), dim.toLong).toInt
          acc(idx) += (if ((d(0) & 1) == 0) 1L else -1L)
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** Derived embedding statistics in one kernel pass: Σ|c|, Σc², and the
    * comma-joined count vector (the md5-signature payload). Keeping these
    * in the kernel — instead of `aggregate()` higher-order functions —
    * keeps the embed_text projection inside whole-stage codegen: HOF
    * lambdas are interpreted and evict their whole stage. */
  def featureHashMeta(toks: ArrayData, dim: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val counts = featureHashCounts(toks, dim).asInstanceOf[GenericArrayData]
    var sumAbs = 0L
    var sumSq = 0L
    val sb = new java.lang.StringBuilder(dim * 3)
    var j = 0
    while (j < dim) {
      val c = counts.getLong(j)
      sumAbs += java.lang.Math.abs(c)
      sumSq += c * c
      if (j > 0) sb.append(',')
      sb.append(c)
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sumAbs, sumSq, UTF8String.fromString(sb.toString)))
  }

  def featureHashEmbed(toks: ArrayData, dim: Int): ArrayData = {
    val counts = featureHashCounts(toks, dim).asInstanceOf[GenericArrayData]
    val acc = new Array[Double](dim)
    var ss = 0.0
    var j = 0
    while (j < dim) {
      val c = counts.getLong(j).toDouble
      acc(j) = c
      ss += c * c
      j += 1
    }
    if (ss > 0.0) {
      val inv = 1.0 / java.lang.Math.sqrt(ss)
      j = 0
      while (j < dim) { acc(j) *= inv; j += 1 }
    }
    new GenericArrayData(acc)
  }

  private val space = UTF8String.fromString(" ")

  def wordShingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val out = new mutable.LinkedHashSet[UTF8String]
    if (m < n) {
      val all = new Array[UTF8String](m)
      var i = 0
      while (i < m) { all(i) = toks.getUTF8String(i); i += 1 }
      out += UTF8String.concatWs(space, all.toIndexedSeq: _*)
    } else {
      var i = 0
      while (i <= m - n) {
        val w = new Array[UTF8String](n)
        var j = 0
        while (j < n) { w(j) = toks.getUTF8String(i + j); j += 1 }
        out += UTF8String.concatWs(space, w.toIndexedSeq: _*)
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** ALL word n-shingles in position order — duplicates kept, one per
    * start position (docs shorter than n collapse to the single
    * whole-doc shingle, the [[wordShingles]] short-doc rule). Positional
    * multiplicity is what span-level duplication statistics need: the
    * fraction of a doc covered by repeated grams counts POSITIONS, not
    * the distinct gram set. */
  def wordShinglesAll(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) {
      val all = new Array[UTF8String](m)
      var i = 0
      while (i < m) { all(i) = toks.getUTF8String(i); i += 1 }
      new GenericArrayData(
        Array[Any](UTF8String.concatWs(space, all.toIndexedSeq: _*)))
    } else {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) {
        val w = new Array[UTF8String](n)
        var j = 0
        while (j < n) { w(j) = toks.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(space, w.toIndexedSeq: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Byte offset of every code point (plus the end offset), in one pass —
    * per-position substring extraction would be O(chars²). */
  private def codePointOffsets(bytes: Array[Byte]): Array[Int] = {
    val offs = new mutable.ArrayBuffer[Int](bytes.length + 1)
    var i = 0
    while (i < bytes.length) {
      offs += i
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs += bytes.length
    offs.toArray
  }

  def charShingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes // one materialization; slices below are zero-copy
    val offs = codePointOffsets(bytes)
    val m = offs.length - 1
    val out = new mutable.LinkedHashSet[UTF8String]
    if (m < n) out += s
    else {
      var i = 0
      while (i <= m - n) {
        out += UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]

  private def coefs(numPerm: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(numPerm, _ =>
      (Array.tabulate(numPerm)(SigUtil.coefA), Array.tabulate(numPerm)(SigUtil.coefB)))

  private def minhashRaw(sh: ArrayData, numPerm: Int): Array[Long] = {
    val (as, bs) = coefs(numPerm)
    val m = sh.numElements()
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < m) {
      if (!sh.isNullAt(i)) {
        val h = SigUtil.baseHash(sh.getUTF8String(i))
        var j = 0
        while (j < numPerm) {
          val p = SigUtil.permHash(as(j), bs(j), h)
          if (p < sig(j)) sig(j) = p
          j += 1
        }
      }
      i += 1
    }
    sig
  }

  def minhashSig(sh: ArrayData, numPerm: Int): ArrayData =
    new GenericArrayData(minhashRaw(sh, numPerm))

  def minhashBandKeys(sh: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val sig = minhashRaw(sh, bands * rowsPerBand)
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var k = 0x9E3779B97F4A7C15L * (b + 1)
      var r = 0
      while (r < rowsPerBand) {
        k = java.lang.Long.rotateLeft(k ^ sig(b * rowsPerBand + r), 27) * 0xC2B2AE3D27D4EB4FL
        r += 1
      }
      keys(b) = k
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Pinned sign hashes of the perceptual weighted SimHash: one 64-bit
    * md5 ("ph:<bin>") per histogram bin — bit t of bin j's hash is j's
    * vote sign for signature bit t. The engine-wide md5_number_lower
    * family, so the SQL oracle embeds the identical literals. */
  private lazy val perceptualBinHash: Array[Long] =
    Array.tabulate(64)(j => md5LowerOf(UTF8String.fromString("ph:" + j)))

  /** Perceptual media signature in ONE kernel pass over the payload:
    * struct(n = byte count, counts = the 64-bin byte-value histogram as
    * exact longs, sig = the 32-bit weighted SimHash — s_t = Σ_j
    * counts(j)·sign(j,t), bit t = [s_t ≥ 0]). The media twin of
    * [[simhashSig]]: counts stay integer so the verify stage's
    * cross-multiplied L1 is exact, and the signature rides codegen like
    * the text kernels (no encoder round-trip, no mapPartitions). */
  def perceptualSig(payload: Array[Byte]): InternalRow = {
    val counts = new Array[Long](64)
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xff) % 64) += 1L
      i += 1
    }
    var sig = 0L
    var t = 0
    while (t < 32) {
      var s = 0L
      var j = 0
      while (j < 64) {
        s += counts(j) * (((perceptualBinHash(j) >>> t) & 1L) * 2L - 1L)
        j += 1
      }
      if (s >= 0L) sig |= 1L << t
      t += 1
    }
    new GenericInternalRow(Array[Any](payload.length.toLong,
      new GenericArrayData(counts), sig))
  }

  def simhashSig(toks: ArrayData): Long = {
    val m = toks.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val h = md5LowerOf(toks.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Winnow fingerprints as struct(fps_csv, n_fps) in one kernel pass —
    * the md5-signature payload form, kept kernel-side for the same
    * codegen reason as [[featureHashMeta]]. */
  def winnowMeta(s: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val fps = winnowFingerprints(s, k, w).asInstanceOf[GenericArrayData]
    val n = fps.numElements()
    val sb = new java.lang.StringBuilder(n * 8)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      sb.append(fps.getLong(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(sb.toString), n.toLong))
  }

  /** One BPE merge application: replace every left-to-right
    * NON-OVERLAPPING adjacent (left, right) pair in `syms` with the
    * concatenated symbol, single pass. Greedy-fold equivalence (the
    * oracle replays this as a list_reduce fold): after a merge the new
    * last element is left+right, which can never equal `left` again
    * (right is non-empty), so "merge with accumulator tail" and
    * "merge-and-skip scanning" produce the same sequence — e.g.
    * [l,l,l,l] with (l,l) → [ll,ll], [l,l,l] → [ll,l]. */
  def bpeMergeStep(syms: ArrayData, left: UTF8String,
      right: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      if (i + 1 < n && cur.equals(left) &&
          syms.getUTF8String(i + 1).equals(right)) {
        out += UTF8String.concat(left, right)
        i += 2
      } else {
        out += cur
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  def winnowFingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val offs = codePointOffsets(bytes)
    val m = offs.length - 1
    // grams in [0, P): non-negative as signed longs, so the window-min
    // and sort below order identically to the oracle's UBIGINT compare
    val grams: Array[Long] =
      if (m < k) Array(SigUtil.baseHash(s))
      else Array.tabulate(m - k + 1)(i =>
        java.lang.Long.remainderUnsigned(
          md5LowerOfRange(bytes, offs(i), offs(i + k) - offs(i)), SigUtil.P))
    val mins =
      if (grams.length <= w) Array(grams.min)
      else Array.tabulate(grams.length - w + 1) { i =>
        var mn = grams(i)
        var j = 1
        while (j < w) { if (grams(i + j) < mn) mn = grams(i + j); j += 1 }
        mn
      }
    val distinct = mins.distinct
    java.util.Arrays.sort(distinct)
    new GenericArrayData(distinct)
  }

  /** One-pass char-entropy kernel over the ASCII [a-z0-9 ] alphabet of an
    * (already case-folded) string: (n_ascii, n_distinct, entropy-in-nats).
    * Byte-wise scan — every alphabet char is a single UTF-8 byte and
    * every byte ≥ 0x80 (multibyte lead or continuation) is out of
    * alphabet by construction. The entropy sum folds −(p·ln p) in
    * ASCENDING char order (space < digits < letters — UTF-8 byte order),
    * matching the oracle's ORDER BY c fold term-for-term; the HOF
    * formulation this replaces was interpreted and O(len·|alphabet|)
    * per row (the r16 bench caught it at 18.8 s). */
  def charEntropy(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val counts = new Array[Long](123) // 'z' = 122
    var i = 0
    var n = 0L
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b == ' ' || (b >= '0' && b <= '9') || (b >= 'a' && b <= 'z')) {
        counts(b) += 1; n += 1
      }
      i += 1
    }
    var nd = 0L
    var acc = 0.0
    var c = 0
    while (c < 123) {
      val k = counts(c)
      if (k > 0) {
        nd += 1
        val p = k.toDouble / n.toDouble
        acc += -(p * java.lang.Math.log(p))
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, nd, acc))
  }
}
