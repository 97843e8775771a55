package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** Property-style checks of the text kernel over scalacheck-generated
  * inputs (fixed seeds — deterministic, no scalatestplus bridge in the
  * offline cache). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val texts: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.oneOf(" ", "\t", "!", ",", "--", "Ω")))
      .map(_.mkString)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def tokensOf(batch: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    batch.toDF("t")
      .select(TextFunctions.tokens(col("t")).as("x"))
      .collect().map(_.getSeq[String](0)).toSeq
  }

  test("tokenizer: tokens are nonempty, lowercase-alnum, and idempotent") {
    for (seed <- 1L to 10L) {
      val batch = sample(Gen.listOfN(20, texts), seed)
      val toks = tokensOf(batch)
      toks.flatten.foreach(t => assert(t.nonEmpty && t.matches("[a-z0-9]+"), s"seed=$seed tok=$t"))
      // re-tokenizing the joined tokens is a fixpoint
      assert(tokensOf(toks.map(_.mkString(" "))) === toks, s"seed=$seed")
    }
  }

  test("simhash of identical token multisets is order-invariant") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val words = sample(
        Gen.listOfN(8, Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))), seed)
      val fwd = words.map(_.mkString(" "))
      val rev = words.map(_.reverse.mkString(" "))
      def hashes(xs: Seq[String]) = xs.toDF("t").select(
        TextFunctions.simhash32(TextFunctions.tokenSet(col("t")))).collect().map(_.getLong(0)).toSeq
      assert(hashes(fwd) === hashes(rev), s"seed=$seed")
    }
  }
}
