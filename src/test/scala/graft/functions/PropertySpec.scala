package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based coverage of the custom Expression kernels (SURVEY §5):
  * each compute path is checked against an independent, obviously-correct
  * Scala reference over generated inputs (raw ScalaCheck — no
  * scalatestplus bridge in the build). Pure JVM — no SparkSession, so
  * hundreds of cases run in milliseconds (codegen-vs-interpreted equality
  * of the same kernels is pinned separately in FunctionsSpec). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val P = graft.llm.LlmHash.P
  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(8 -> Gen.alphaLowerChar, 2 -> Gen.const(' ')))
        .map(_.mkString))
  private val gramArr: Gen[List[Long]] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, P - 1)))

  /** Direct polynomial reference for the Rabin–Karp window hashes. */
  private def refRolling(s: String, k: Int): Seq[Long] = {
    import graft.functions.RollingHash.{B, P => RP}
    (0 to s.length - k).map { i =>
      var h = 0L
      for (j <- 0 until k) h = (h * B + s.charAt(i + j).toLong) % RP
      h
    }
  }

  test("rolling_hash equals the direct polynomial on arbitrary ASCII text") {
    check(Prop.forAll(asciiText, Gen.chooseNum(1, 8)) { (s: String, k: Int) =>
      val got = RollingHash.compute(UTF8String.fromString(s), k)
      if (s.length < k) got.numElements() == 0
      else {
        val exp = refRolling(s, k)
        got.numElements() == exp.length &&
          (0 until exp.length).forall(i => got.getLong(i) == exp(i))
      }
    })
  }

  test("minhash_sigs equals per-seed minima of avalanched affine rehashes") {
    val A = graft.llm.LlmHash.A
    val B = graft.llm.LlmHash.B
    check(Prop.forAll(gramArr) { gs: List[Long] =>
      val got = MinHashSigs.compute(ArrayData.toArrayData(gs.toArray))
      (0 until 16).forall { s =>
        val exp =
          if (gs.isEmpty) Long.MaxValue
          else gs.map { g =>
            val h = (g * g + 987654321L) % P
            (A(s) * h + B(s)) % P
          }.min
        got.getLong(s) == exp
      }
    })
  }

  test("simhash_sig bit b is the sign of the ±1 parity-weight sum") {
    val A = graft.llm.LlmHash.A
    val B = graft.llm.LlmHash.B
    check(Prop.forAll(gramArr) { gs: List[Long] =>
      val got = SimHashSig.compute(ArrayData.toArrayData(gs.toArray))
      (0 until 60).forall { b =>
        val w = gs.map { g =>
          val h = (g * g + 987654321L) % P
          if ((A(16 + b) * h + B(16 + b)) % P % 2 == 1) 1L else -1L
        }.sum
        ((got >> b) & 1L) == (if (w > 0) 1L else 0L)
      }
    })
  }

  test("md5_long60 equals the composed hex fold of MessageDigest md5") {
    check(Prop.forAll(asciiText) { s: String =>
      val bytes = s.getBytes("UTF-8")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      Md5Long.hash60(bytes) == java.lang.Long.parseLong(hex.substring(0, 15), 16)
    })
  }

  test("vector_dot is the left-to-right sequential product sum") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val vec = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)))
    check(Prop.forAll(vec, vec) { (a: List[Double], b: List[Double]) =>
      val got = VectorDot(
        Literal.create(a.toArray, ArrayType(DoubleType)),
        Literal.create(b.toArray, ArrayType(DoubleType))
      ).eval(null).asInstanceOf[Double]
      var exp = 0.0
      for (i <- 0 until math.min(a.length, b.length)) exp += a(i) * b(i)
      java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(exp)
    })
  }

  test("vector_l2q is the exact common-prefix sum of squared differences") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val vec = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-20000L, 20000L)))
    check(Prop.forAll(vec, vec) { (a: List[Long], b: List[Long]) =>
      val got = VectorL2Q(
        Literal.create(a.toArray, ArrayType(LongType)),
        Literal.create(b.toArray, ArrayType(LongType))
      ).eval(null).asInstanceOf[Long]
      val exp = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      got == exp
    })
  }

  test("sorted_intersect_count equals set intersection size on sorted distinct arrays") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    // small value domain forces heavy overlap; contract inputs are
    // distinct + ascending (the per-doc gram-set projection's shape)
    val set = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 80L))).map(_.distinct.sorted)
    check(Prop.forAll(set, set) { (a: List[Long], b: List[Long]) =>
      val got = SortedIntersectCount(
        Literal.create(a.toArray, ArrayType(LongType)),
        Literal.create(b.toArray, ArrayType(LongType))
      ).eval(null).asInstanceOf[Int]
      got == a.toSet.intersect(b.toSet).size
    })
  }

  test("winnow is the sorted distinct set of full-window sliding minima") {
    val arr = Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 30L))) // heavy ties
    val win = Gen.chooseNum(1, 20)
    check(Prop.forAll(arr, win) { (g: List[Long], w: Int) =>
      val got = Winnow.compute(
        ArrayData.toArrayData(g.toArray), w).toLongArray().toSeq
      val exp =
        if (g.isEmpty) Seq.empty[Long]
        else (0 until math.max(g.length - w + 1, 1))
          .map(j => g.slice(j, j + w).min).distinct.sorted
      got == exp
    })
  }
}
