package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextFunctions, VectorFunctions}

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def one[T](c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq(1).toDF("x").select(c).collect()(0).getAs[T](0)
  }

  private def oneSeq(c: org.apache.spark.sql.Column): Seq[String] = {
    import spark.implicits._
    Seq(1).toDF("x").select(c).collect()(0).getSeq[String](0)
  }

  test("tokenizer: lowercase, split on non-alnum, drop empties") {
    val got = oneSeq(TextFunctions.tokens(lit("Hello,  World! 42__x ")))
    assert(got === Seq("hello", "world", "42", "x"))
  }

  test("tokenizer: empty and all-punctuation strings yield empty array") {
    assert(oneSeq(TextFunctions.tokens(lit(""))).isEmpty)
    assert(oneSeq(TextFunctions.tokens(lit("!!! ---"))).isEmpty)
  }

  test("tokenizer cjk mode: golden-pinned ordered sequences") {
    def cjk(s: String): Seq[String] =
      oneSeq(TextFunctions.tokens(lit(s), cjk = true))
    // script boundary with no whitespace splits; CJK runs -> bigrams
    assert(cjk("Spark入门指南 v2.0") === Seq("spark", "入门", "门指", "指南", "v2", "0"))
    assert(cjk("spark引擎fast") === Seq("spark", "引擎", "fast"))
    // pure-CJK run of 6 -> 5 overlapping bigrams, in order
    assert(cjk("深度学习模型") === Seq("深度", "度学", "学习", "习模", "模型"))
    // isolated ideograph -> unigram; punctuation separates runs
    assert(cjk("云") === Seq("云"))
    assert(cjk("价格:100元") === Seq("价格", "100", "元"))
    // empty / all-separator -> empty
    assert(cjk("") === Seq.empty)
    assert(cjk("!!! ---") === Seq.empty)
  }

  test("tokenizer cjk=false is identical to the pinned tokenizer") {
    val s = "Hello,  World! 42__x 入门"
    val plain = oneSeq(TextFunctions.tokens(lit(s)))
    val flagged = oneSeq(TextFunctions.tokens(lit(s), cjk = false))
    assert(flagged === plain)
  }

  test("word shingles n=3") {
    val toks = TextFunctions.tokens(lit("a b c d"))
    val got = oneSeq(TextFunctions.wordShingles(toks, 3))
    assert(got === Seq("a b c", "b c d"))
  }

  test("shingles of short docs are empty") {
    val toks = TextFunctions.tokens(lit("a b"))
    assert(oneSeq(TextFunctions.wordShingles(toks, 3)).isEmpty)
  }

  test("fingerprint is whitespace/case insensitive") {
    val a = one[String](TextFunctions.fingerprint(lit("Foo   bar\tbaz")))
    val b = one[String](TextFunctions.fingerprint(lit("foo bar baz")))
    assert(a === b)
  }

  test("simhash is deterministic and bit-bounded") {
    val h1 = one[Long](TextFunctions.simhash32(TextFunctions.tokenSet(lit("spark fast query"))))
    val h2 = one[Long](TextFunctions.simhash32(TextFunctions.tokenSet(lit("spark fast query"))))
    assert(h1 === h2)
    assert(h1 >= 0L && h1 < (1L << 32))
  }

  test("simhash of near-identical token sets is close in Hamming distance") {
    val a = one[Long](TextFunctions.simhash32(TextFunctions.tokenSet(
      lit("spark fast query row data table join scan merge sort"))))
    val b = one[Long](TextFunctions.simhash32(TextFunctions.tokenSet(
      lit("spark fast query row data table join scan merge batch"))))
    val dist = java.lang.Long.bitCount(a ^ b)
    assert(dist <= 12, s"hamming($a,$b)=$dist")
  }

  test("cosine of identical vectors is 1") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val sim = df.select(VectorFunctions.cosine(
      VectorFunctions.toDouble(col("a")), VectorFunctions.toDouble(col("b")))).collect()(0).getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    val sim = df.select(VectorFunctions.cosine(
      VectorFunctions.toDouble(col("a")), VectorFunctions.toDouble(col("b")))).collect()(0).getDouble(0)
    assert(sim === 0.0)
  }

  test("l2-normalized vector has unit norm; quantization clamps and zeros") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),          // norm 5, scale 4
      (2L, Array(0.0f, 0.0f)))          // zero vector: normalize/quantize -> zeros
      .toDF("vec_id", "e")
      .select(col("vec_id"), VectorFunctions.toDouble(col("e")).as("e"))
      .withColumn("nrm", VectorFunctions.l2Norm(col("e")))
      .withColumn("scale", VectorFunctions.maxAbs(col("e")))
    val rows = df.select(col("vec_id"),
      VectorFunctions.l2Norm(VectorFunctions.l2NormalizeWith(col("e"), col("nrm"))).as("unit"),
      VectorFunctions.quantizeInt8With(col("e"), col("scale")).as("q"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))).toMap
    assert(math.abs(rows(1L)._1 - 1.0) < 1e-12)
    assert(rows(1L)._2 === Seq(95, 127)) // floor(3/4*127+.5)=95, max clamps to 127
    assert(rows(2L)._1 === 0.0 && rows(2L)._2 === Seq(0, 0))
  }
}
