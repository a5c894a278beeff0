package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import graft.operators.{Embeddings, NearDup}
import graft.functions.TextFns

/** Adversarial-input fuzz over the native Catalyst kernels.
  *
  * The signature kernels (shingles, MinHash, SimHash, winnowing,
  * feature-hash embed) parse raw UTF8String bytes in one pass — exactly
  * the code that meets whatever a 100 TB web corpus contains. This spec
  * drives them over handcrafted nasties (lone surrogates, zero-width
  * characters, astral-plane emoji, huge repetitions, control bytes) plus
  * seeded-random unicode from ScalaCheck generators, all in ONE Spark
  * pass, and checks the structural contracts that every downstream
  * operator assumes:
  *  - no crash, no NULL-from-non-NULL;
  *  - fixed shapes (128-slot sigs, 32 band keys, 64-dim embeddings);
  *  - per-row determinism (each kernel computed twice in the same plan);
  *  - shingle sets are duplicate-free;
  *  - embeddings are unit-norm (or exactly zero for tokenless input);
  *  - MinHash element-wise monotonicity: extending a document can only
  *    lower (or keep) each signature slot — the law bucketed LSH relies
  *    on for containment-ish behavior.
  */
class KernelFuzzSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session

  private val handcrafted = Seq(
    "", " ", "\n\t ", "a", "a b c d e",
    "​​​",                        // zero-width spaces
    "😀🦀 crab party",       // astral-plane emoji
    "\uD800 lone high surrogate",                 // invalid UTF-16 sequence
    "\uDFFF lone low surrogate",
    "\u0000\u0001\u0002 control bytes",
    "大数据引擎分布式计算 中文 无空格",
    "héllo wörld ñaïve façade",
    "𝕊𝕡𝕒𝕣𝕜 𝖒𝖆𝖙𝖍 alphabet",
    "a" * 10000,                                  // one huge token
    "tok " * 2000,                                // many identical tokens
    (1 to 500).map(i => s"w$i").mkString(" "),    // many distinct tokens
    "�￾￿ specials")

  private val generated: Seq[String] = {
    // seeded ScalaCheck generation → reproducible corpus, no flakes
    val cp = Gen.frequency(
      (8, Gen.chooseNum(0x20, 0x7E)),             // ascii
      (3, Gen.chooseNum(0xA0, 0x2FFF)),           // BMP symbols/diacritics
      (2, Gen.chooseNum(0x4E00, 0x9FFF)),         // CJK
      (1, Gen.chooseNum(0x1F300, 0x1FAFF)),       // astral emoji
      (2, Gen.const(0x20)))                       // extra spaces → tokens
    val str = Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, cp).map(_.flatMap(c => Character.toChars(c).toSeq).mkString))
    Iterator.from(0).map(i =>
      str.apply(Gen.Parameters.default, rng.Seed(42L + i)))
      .collect { case Some(s) => s }.take(150).toSeq
  }

  test("signature kernels hold their contracts on adversarial unicode") {
    import spark.implicits._
    val docs = (handcrafted ++ generated).toDF("text")
    val toks = TextFns.wsTokens(lower(col("text")))
    // wordShingles/charShingles take the raw text column (they tokenize
    // and lowercase internally); simhash takes the token array
    val sh = NearDup.wordShingles(col("text"), 3)
    val ch = NearDup.charShingles(col("text"), 5)
    import org.apache.spark.sql.graft.Bridge
    val fps = Bridge.column(graft.expressions.WinnowFingerprints(
      Bridge.expression(lower(col("text"))), 5, 4))
    val out = docs.select(
      col("text"),
      sh.as("sh"), sh.as("sh2"),
      size(sh).as("n_sh"), size(array_distinct(sh)).as("n_sh_d"),
      ch.as("ch"), size(ch).as("n_ch"), size(array_distinct(ch)).as("n_ch_d"),
      NearDup.minhashSig(sh, 128).as("sig"), NearDup.minhashSig(sh, 128).as("sig2"),
      NearDup.minhashBandKeys(sh, 32, 4).as("keys"),
      NearDup.simhashSig(toks).as("sim"), NearDup.simhashSig(toks).as("sim2"),
      fps.as("fps"),
      Embeddings.embedCol(col("text")).as("emb"),
      round(aggregate(Embeddings.embedCol(col("text")),
        lit(0.0), (a, x) => a + x * x), 6).as("sq_norm"))
      .collect()
    assert(out.length == handcrafted.length + generated.length)
    out.foreach { r =>
      val txt = r.getString(0).take(30)
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"shingles nondeterministic: $txt")
      assert(r.getInt(3) == r.getInt(4), s"duplicate word shingles: $txt")
      assert(r.getInt(6) == r.getInt(7), s"duplicate char shingles: $txt")
      assert(r.getSeq[Long](8).length == 128, s"sig size: $txt")
      assert(r.getSeq[Long](8) == r.getSeq[Long](9), s"sig nondeterministic: $txt")
      assert(r.getSeq[Long](10).length == 32, s"band keys size: $txt")
      assert(r.getLong(11) == r.getLong(12), s"simhash nondeterministic: $txt")
      assert(r.getSeq[Long](13) != null, s"winnow returned null: $txt")
      assert(r.getSeq[Float](14).length == 64, s"embed dim: $txt")
      val n = r.getDouble(15)
      assert(math.abs(n - 1.0) < 1e-4 || n == 0.0, s"embed norm $n: $txt")
    }
  }

  test("VecIsValid: codegen, interpreted eval, and a Scala reference agree") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    // the kernel has TWO implementations (nullSafeEval + doGenCode); a
    // silent divergence between them is the classic native-kernel bug.
    // Seeded random vectors cover every branch: NaN/±Inf cells, NULL
    // cells, empty, short, long, exact-dim clean.
    val dim = Embeddings.EmbeddingDim
    val rnd = new scala.util.Random(7)
    def randVec(): Seq[Option[Double]] = {
      val n = Seq(0, 1, dim / 2, dim, dim, dim, dim, dim + 1)(rnd.nextInt(8))
      Seq.fill(n) {
        rnd.nextInt(24) match {
          case 0 => Some(Double.NaN)
          case 1 => Some(Double.PositiveInfinity)
          case 2 => Some(Double.NegativeInfinity)
          case 3 => None
          case _ => Some(rnd.nextDouble() - 0.5)
        }
      }
    }
    val vecs = Seq.fill(400)(randVec())
    def ref(v: Seq[Option[Double]]): Boolean =
      v.length == dim && v.forall(_.exists(d => !d.isNaN && !d.isInfinite))
    // codegen path: whole-stage projection over a DataFrame
    val got = vecs.toDF("v")
      .select(Embeddings.validEmb(col("v")).as("ok")).as[Boolean].collect()
    got.lazyZip(vecs).foreach { (g, v) =>
      assert(g == ref(v), s"codegen path: ${v.take(4)}... len=${v.length}")
    }
    // interpreted path: direct eval on Literals, double AND float element
    // types (the raw table column is float; specs feed double)
    vecs.foreach { v =>
      val asDouble = Literal.create(
        v.map(_.map(Double.box).orNull): Seq[Any],
        ArrayType(DoubleType, containsNull = true))
      assert(graft.expressions.VecIsValid(asDouble, dim).eval(null) ==
        ref(v), s"interpreted double: ${v.take(4)}... len=${v.length}")
      val asFloat = Literal.create(
        v.map(_.map(d => Float.box(d.toFloat)).orNull): Seq[Any],
        ArrayType(FloatType, containsNull = true))
      val refF = v.length == dim &&
        v.forall(_.exists(d => !d.toFloat.isNaN && !d.toFloat.isInfinite))
      assert(graft.expressions.VecIsValid(asFloat, dim).eval(null) ==
        refF, s"interpreted float: ${v.take(4)}... len=${v.length}")
    }
  }

  test("minhash signatures are element-wise monotone under document growth") {
    import spark.implicits._
    val pairs = generated.take(60).zipWithIndex
      .map { case (s, i) => (s"$s base tokens here", s"$s base tokens here extra$i more$i") }
      .toDF("base", "ext")
    def sig(c: org.apache.spark.sql.Column) =
      NearDup.minhashSig(NearDup.wordShingles(c, 3), 128)
    val bad = pairs.select(
      // extending a doc adds shingles; each sig slot is a min over more
      // hashes, so it can only go down or hold
      zip_with(sig(col("ext")), sig(col("base")), (e, b) => e > b).as("gt"))
      .where(exists(col("gt"), x => x))
      .count()
    assert(bad == 0, s"$bad rows violate element-wise monotonicity")
  }

  test("PQ kernels: encode/lut/adc agree with a brute-force reference") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import graft.expressions.PqKernels
    val dim = 64; val m = 8; val d = dim / m
    val rnd = new scala.util.Random(23)
    val codebook = Array.fill(16 * dim)(rnd.nextGaussian())
    val codesN = 16
    def l2sq(v: Array[Double], s: Int, code: Int): Double = {
      var acc = 0.0
      (0 until d).foreach { j =>
        val diff = v(s * d + j) - codebook(code * dim + s * d + j)
        acc += diff * diff
      }
      acc
    }
    (1 to 50).foreach { _ =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val enc = PqKernels.encode(ArrayData.toArrayData(v), codebook, m, dim)
      assert(enc.numElements() == m)
      (0 until m).foreach { s =>
        // law: the code IS the first argmin over the codebook
        val dists = (0 until codesN).map(c => l2sq(v, s, c))
        val want = dists.indexOf(dists.min)
        assert(enc.getInt(s) == want, s"subspace $s: ${enc.getInt(s)} != $want")
      }
      val lut = PqKernels.lut(ArrayData.toArrayData(v), codebook, m, dim)
      assert(lut.numElements() == m * codesN)
      (0 until m).foreach { s => (0 until codesN).foreach { c =>
        assert(lut.getDouble(s * codesN + c) == l2sq(v, s, c)) } }
      // law: adc(codes, lut) == the s-ascending sum of looked-up cells
      val codes2 = Array.fill(m)(rnd.nextInt(codesN))
      var ref = 0.0
      (0 until m).foreach(s => ref += lut.getDouble(s * codesN + codes2(s)))
      assert(PqKernels.adc(ArrayData.toArrayData(codes2), lut) == ref)
      // self-consistency: a vector's ADC against its own LUT at its own
      // codes equals the sum of its per-subspace quantization errors —
      // and is MINIMAL over any other code assignment
      val own = PqKernels.adc(enc, lut)
      assert(own <= PqKernels.adc(ArrayData.toArrayData(codes2), lut) + 1e-12)
      // a codebook vector encodes to itself with zero error everywhere
      val cvec = Array.tabulate(dim)(j => codebook(3 * dim + j))
      val cenc = PqKernels.encode(ArrayData.toArrayData(cvec), codebook, m, dim)
      val clut = PqKernels.lut(ArrayData.toArrayData(cvec), codebook, m, dim)
      assert(PqKernels.adc(cenc, clut) == 0.0,
        "a codebook member must quantize losslessly")
    }
  }
}
