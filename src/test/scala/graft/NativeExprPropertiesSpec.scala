package graft

import graft.functions.Funcs
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the fused native expressions: each must equal
  * its composable Catalyst twin on random inputs — including unicode
  * with supplementary (surrogate-pair) characters, empties, and
  * shorter-than-window strings — not just the parquet fixtures the
  * equality specs use.
  */
class NativeExprPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // alphanumerics, spaces, BMP accents/CJK, an em dash, and a
  // surrogate-pair musical symbol to stress codepoint stepping
  private val uniChar: Gen[String] = Gen.oneOf(
    Gen.alphaNumChar.map(_.toString),
    Gen.oneOf(" ", "ö", "好", "—", "€", "𝄞"))
  private val uniString: Gen[String] =
    Gen.listOf(uniChar).map(_.mkString.take(120))

  private def runProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  test("distinct_shingles equals composable form on random unicode") {
    graft.functions.DistinctShingleCount.register(spark)
    runProp(Prop.forAll(Gen.listOfN(40, uniString),
        Gen.choose(2, 20)) { (ss, n) =>
      val df = ss.toDF("s")
      val bad = df.select(
        expr(s"distinct_shingles(s, $n)").as("native"),
        size(array_distinct(Funcs.charShingles(col("s"), n)))
          .cast("long").as("composed"))
        .filter(col("native") =!= col("composed")).count()
      bad == 0
    })
  }

  test("rolling_fingerprint equals composable form on random unicode") {
    graft.functions.RollingFingerprint.register(spark)
    runProp(Prop.forAll(Gen.listOfN(40, uniString)) { ss =>
      val bad = ss.toDF("s").select(
        expr("rolling_fingerprint(s)").as("native"),
        Funcs.fingerprint(col("s")).as("composed"))
        .filter(col("native") =!= col("composed")).count()
      bad == 0
    })
  }

  test("vec_dot equals composable dotProduct bit-for-bit on random floats") {
    graft.functions.VecDot.register(spark)
    val vec = Gen.choose(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100f, 100f)))
    runProp(Prop.forAll(Gen.listOfN(25, vec)) { vs =>
      // pair each vector with its reverse: same length, so both forms
      // are non-null and must agree to the last bit
      val df = vs.map(v => (v, v.reverse)).toDF("a", "b")
      val bad = df.select(
        call_function("vec_dot", col("a"), col("b")).as("native"),
        Funcs.dotProduct(col("a"), col("b")).as("composed"))
        .filter(col("native") =!= col("composed")).count()
      bad == 0
    })
  }

  test("token_md5s equals composable form on random unicode") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "p_token_md5s",
      exprs => graft.functions.TokenMd5s(exprs.head, 8), "scala_udf")
    val composed = transform(array_distinct(Funcs.tokens(col("s"))),
      t => Funcs.md5Long(t, 8))
    runProp(Prop.forAll(Gen.listOfN(40, uniString)) { ss =>
      // order included: first-occurrence order on both sides
      val bad = ss.toDF("s").select(
        call_function("p_token_md5s", col("s")).as("native"),
        composed.as("composed"))
        .filter(col("native") =!= col("composed")).count()
      bad == 0
    })
  }

  test("minhash_sigs and simhash64 equal composable forms on random hashes") {
    val P = 2147483647L
    val params = (0 until 16).map { j =>
      ((1000003L * (2 * j + 3)) % P, (998244353L * (j + 7)) % P)
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "p_minhash",
      exprs => graft.functions.MinHashSigs(exprs.head, params, P),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "p_simhash",
      exprs => graft.functions.SimHashBits(exprs.head, 32), "scala_udf")
    val hashes = Gen.listOf(Gen.choose(0L, 1L << 28)).map(_.take(60))
    runProp(Prop.forAll(Gen.listOfN(25, hashes)) { hs =>
      val df = hs.filter(_.nonEmpty).toDF("hs")
      val sigComposed = params.map { case (a, b) =>
        array_min(transform(col("hs"), h => (h * a + b) % P))
      }
      val simComposed = (0 until 32).map { b =>
        val vote = aggregate(col("hs"), lit(0L),
          (acc, h) => acc + (shiftright(h, b).bitwiseAND(lit(1L)) * 2 - 1))
        when(vote > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
      val bad = df.select(
        call_function("p_minhash", col("hs")).as("nm"),
        array(sigComposed: _*).as("cm"),
        call_function("p_simhash", col("hs")).as("ns"),
        simComposed.as("cs"))
        .filter(col("nm") =!= col("cm") || col("ns") =!= col("cs")).count()
      bad == 0
    })
  }
}
