package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AdcTableLong, CharNgrams, MinHashBands, PqAdcDistanceLong, SortedIntersectCount}
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the custom kernels' interpreted eval against plain
  * Scala references (the codegen path is exercised by the DataFrame
  * specs; Spark guarantees eval/doGenCode agreement is our contract,
  * checked for l2sq/dot in VectorExprSpec). */
class KernelPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def arrLit(xs: Array[Long]): Literal =
    Literal.create(xs.toSeq, ArrayType(LongType, containsNull = false))

  test("AdcTableLong equals the per-entry brute force for random shapes") {
    val gen = for {
      m <- Gen.choose(1, 6)
      ksub <- Gen.choose(1, 8)
      dsub <- Gen.choose(1, 5)
      cb <- Gen.listOfN(m * ksub * dsub, Gen.choose(-2000000L, 2000000L))
      rv <- Gen.listOfN(m * dsub, Gen.choose(-2000000L, 2000000L))
    } yield (m, ksub, dsub, cb.toArray, rv.toArray)
    check(Prop.forAll(gen) { case (m, ksub, dsub, cb, rv) =>
      val out = AdcTableLong(arrLit(rv), cb, m, ksub, dsub)
        .eval(null).asInstanceOf[ArrayData].toLongArray()
      val expected = Array.tabulate(m * ksub) { idx =>
        val sub = idx / ksub; val code = idx % ksub
        (0 until dsub).map { j =>
          val d = rv(sub * dsub + j) - cb(idx * dsub + j); d * d
        }.sum
      }
      out.sameElements(expected)
    })
  }

  test("AdcTableLong raises on wrong vector dimension") {
    intercept[IllegalArgumentException] {
      AdcTableLong(arrLit(Array(1L, 2L, 3L)), Array.fill(8)(0L), 2, 2, 2).eval(null)
    }
  }

  test("MinHashBands equals the min-then-fold reference") {
    val mod = 1000000007L
    val gen = for {
      nb <- Gen.oneOf(1, 2, 4)
      r <- Gen.choose(1, 4)
      nh = nb * r
      ca <- Gen.listOfN(nh, Gen.choose(1L, 1L << 20))
      cbv <- Gen.listOfN(nh, Gen.choose(0L, 1L << 20))
      ph <- Gen.listOfN(Gen.choose(0, 40).sample.getOrElse(5), Gen.choose(0L, mod - 1))
    } yield (nb, ca.toArray, cbv.toArray, ph.toArray)
    check(Prop.forAll(gen) { case (nb, ca, cbv, ph) =>
      val out = MinHashBands(arrLit(ph), ca, cbv, nb, mod).eval(null)
      if (ph.isEmpty) out == null
      else {
        val nh = ca.length; val r = nh / nb
        val mins = Array.tabulate(nh)(s => ph.map(h => (h * ca(s) + cbv(s)) % mod).min)
        val expected = Array.tabulate(nb)(b =>
          (b * r until (b + 1) * r).foldLeft(0L)((acc, i) => (acc * 31 + mins(i)) % mod))
        out.asInstanceOf[ArrayData].toLongArray().sameElements(expected)
      }
    })
  }

  test("SortedIntersectCount equals set intersection on sorted distinct arrays") {
    check(Prop.forAll { (a: Set[Long], b: Set[Long]) =>
      val sa = a.toArray.sorted; val sb = b.toArray.sorted
      val n = SortedIntersectCount(arrLit(sa), arrLit(sb)).eval(null)
      n == a.intersect(b).size
    })
  }

  test("PqAdcDistanceLong equals the direct table lookup sum") {
    val gen = for {
      m <- Gen.choose(1, 8)
      ksub <- Gen.choose(1, 8)
      table <- Gen.listOfN(m * ksub, Gen.choose(-1000000L, 1000000L))
      codes <- Gen.listOfN(m, Gen.choose(0, ksub - 1))
    } yield (ksub, table.toArray, codes.toArray)
    check(Prop.forAll(gen) { case (ksub, table, codes) =>
      val codesLit = Literal.create(codes.toSeq, ArrayType(IntegerType, containsNull = false))
      val v = PqAdcDistanceLong(arrLit(table), codesLit, ksub).eval(null)
      v == codes.zipWithIndex.map { case (c, j) => table(j * ksub + c) }.sum
    })
  }

  test("MaxSimScore equals the naive sum-of-best reference for random bags") {
    def bagLit(b: List[List[Long]]) = Literal.create(b,
      ArrayType(ArrayType(LongType, containsNull = false), containsNull = false))
    val gen = for {
      dims <- Gen.choose(1, 6)
      nq <- Gen.choose(1, 5)
      nd <- Gen.choose(0, 7)
      q <- Gen.listOfN(nq, Gen.listOfN(dims, Gen.choose(-1000L, 1000L)))
      d <- Gen.listOfN(nd, Gen.listOfN(dims, Gen.choose(-1000L, 1000L)))
    } yield (q, d)
    check(Prop.forAll(gen) { case (q, d) =>
      val got = graft.functions.MaxSimScore(bagLit(q), bagLit(d)).eval(null)
      val want =
        if (d.isEmpty) 0L
        else q.map(qv => d.map(dv => qv.zip(dv).map { case (a, b) => a * b }.sum).max).sum
      got == want
    })
  }

  test("Bloom positions: membership never false-negative for random key sets") {
    import org.apache.spark.sql.functions.col
    val spark = SparkTestSession.spark
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    // each trial runs 2 Spark jobs — keep the trial count modest
    val p = Prop.forAll(gen) { keys =>
      val df = keys.toDF("k")
      val words = graft.operators.Joins.bloomFilterWords(df, "k", numWords = 32)
      graft.operators.Joins.bloomProbe(df, "k", words).count() == df.count()
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("quantile sketch: any values, any split — n conserved, every query within the carried bound") {
    import graft.operators.QuantileSketch.Sketch
    val gen = for {
      n <- Gen.choose(1, 3000)
      vals <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
      cut <- Gen.choose(0, n)
      k <- Gen.oneOf(8, 16, 32)
    } yield (vals, cut, k)
    check(Prop.forAll(gen) { case (vals, cut, k) =>
      val (l, r) = vals.splitAt(cut)
      val s = l.foldLeft(Sketch.empty(k))(_.add(_))
        .merge(r.foldLeft(Sketch.empty(k))(_.add(_)))
      val sorted = vals.sorted.toIndexedSeq
      def trueRankRange(v: Long): (Long, Long) =
        (sorted.count(_ < v).toLong, sorted.count(_ <= v).toLong)
      s.n == vals.length.toLong &&
        Seq(0L, (s.n - 1) / 2, s.n - 1).forall { t =>
          val est = s.query(t)
          val (lo, hi) = trueRankRange(est)
          lo - s.errBound <= t && t <= hi + s.errBound
        }
    })
  }

  test("rendezvous sharding: any ids, any S — scale-out only routes keys to the new shard") {
    import SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = for {
      s <- Gen.choose(2, 12)
      ids <- Gen.listOfN(400, Gen.choose(0L, Long.MaxValue / 4))
    } yield (s, ids.distinct)
    val p = Prop.forAll(gen) { case (s, ids) =>
      val df = ids.toDF("id")
      val a = graft.operators.Sampling.withRendezvousShard(
        graft.operators.Sampling.withRendezvousShard(df, "id", s, "sa"),
        "id", s + 1, "sb")
        .select(col("sa"), col("sb")).collect()
      a.forall { r =>
        val (before, after) = (r.getLong(0), r.getLong(1))
        before >= 0 && before < s && after >= 0 && after <= s &&
          (before == after || after == s)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("CharNgrams equals the sliding-substring reference (incl. multibyte)") {
    val genStr = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('\u00e9', '\u4e2d', ' ', '\u00df')))
      .map(_.mkString)
    val gen = for {
      s <- genStr
      n <- Gen.choose(1, 4)
      d <- Gen.oneOf(true, false)
    } yield (s, n, d)
    check(Prop.forAll(gen) { case (s, n, d) =>
      val out = CharNgrams(Literal.create(s, StringType), n, d)
        .eval(null).asInstanceOf[ArrayData]
      val got = (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
      // reference: code-point sliding windows; distinct keeps first occurrences
      val cps = s.codePoints().toArray
      val all = (0 to cps.length - n)
        .map(i => new String(cps, i, n))
      val expected = if (d) all.distinct else all
      got == expected
    })
  }

  test("CharNgrams on strings shorter than n yields an empty array") {
    val out = CharNgrams(Literal.create("ab", StringType), 3, false)
      .eval(null).asInstanceOf[ArrayData]
    assert(out.numElements() == 0)
  }

  test("NfcNormalize equals java.text.Normalizer NFC and is idempotent") {
    // mix of ASCII, precomposed (é ß 中), decomposed bases + combining
    // marks (acute, ring, diaeresis, tilde) — the forms web text carries
    val genStr = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('é', 'ß', '中', ' '),
      1 -> Gen.oneOf('e', 'A', 'o', 'n'),
      1 -> Gen.oneOf('\u0301', '\u030A', '\u0308', '\u0303')))
      .map(_.mkString)
    check(Prop.forAll(genStr) { s =>
      val got = graft.functions.NfcNormalize
        .compute(UTF8String.fromString(s)).toString
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      val again = graft.functions.NfcNormalize
        .compute(UTF8String.fromString(got)).toString
      got == want && again == got
    })
  }

  test("NfcNormalize ASCII fast path returns the input object unchanged") {
    val genAscii = Gen.listOf(Gen.choose(0.toChar, 127.toChar)).map(_.mkString)
    check(Prop.forAll(genAscii) { s =>
      val in = UTF8String.fromString(s)
      graft.functions.NfcNormalize.compute(in) eq in
    })
  }
}
