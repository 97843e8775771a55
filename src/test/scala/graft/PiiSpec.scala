package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** PII scan + redaction (TextAnalysis.redactPii): per-type counts, typed
  * placeholders, ordering contract, idempotence, null safety. */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(texts: (Long, String)*): Map[Long, org.apache.spark.sql.Row] =
    TextAnalysis.redactPii(texts.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("each PII type detected and redacted with its placeholder") {
    val out = run(
      0L -> "mail me at jane.doe+x@corp.example.org today",
      1L -> "server 192.168.0.1 is up",
      2L -> "call 555-867-5309 or 555.867.5309",
      3L -> "ssn 078-05-1120 on file",
      4L -> "card 4111-1111-1111-1111 charged")
    assert(out(0L).getAs[Long]("n_email") === 1L)
    assert(out(0L).getAs[String]("redacted") === "mail me at <EMAIL> today")
    assert(out(1L).getAs[Long]("n_ipv4") === 1L)
    assert(out(1L).getAs[String]("redacted") === "server <IP> is up")
    assert(out(2L).getAs[Long]("n_phone") === 2L)
    assert(out(2L).getAs[String]("redacted") === "call <PHONE> or <PHONE>")
    assert(out(3L).getAs[Long]("n_ssn") === 1L)
    assert(out(3L).getAs[String]("redacted") === "ssn <SSN> on file")
    assert(out(4L).getAs[Long]("n_cc") === 1L)
    assert(out(4L).getAs[String]("redacted") === "card <CC> charged")
  }

  test("ordering contract: a card number is one <CC>, not phone fragments") {
    val out = run(0L -> "pay 4111 1111 1111 1111 now")
    assert(out(0L).getAs[Long]("n_cc") === 1L)
    assert(out(0L).getAs[Long]("n_phone") === 0L)
    assert(out(0L).getAs[String]("redacted") === "pay <CC> now")
  }

  test("ssn and phone group shapes are mutually exclusive") {
    val out = run(0L -> "a 078-05-1120 b 555-867-5309 c")
    assert(out(0L).getAs[Long]("n_ssn") === 1L)
    assert(out(0L).getAs[Long]("n_phone") === 1L)
    assert(out(0L).getAs[String]("redacted") === "a <SSN> b <PHONE> c")
  }

  test("card abutting an ssn: both redact cleanly (consistent-separator rule)") {
    val out = run(0L -> "id 078-05-1120 4111-1111-1111-1111 y")
    assert(out(0L).getAs[Long]("n_ssn") === 1L)
    assert(out(0L).getAs[Long]("n_cc") === 1L)
    assert(out(0L).getAs[String]("redacted") === "id <SSN> <CC> y")
  }

  test("mixed-separator card does not match (documented non-goal)") {
    val out = run(0L -> "pay 4111-1111 1111-1111 now")
    assert(out(0L).getAs[Long]("n_cc") === 0L)
  }

  test("clean text passes through unchanged; counts all zero") {
    val out = run(0L -> "the quick brown fox jumps at 10 am on day 3")
    val r = out(0L)
    for (t <- Seq("n_email", "n_cc", "n_ssn", "n_phone", "n_ipv4"))
      assert(r.getAs[Long](t) === 0L, t)
    assert(r.getAs[String]("redacted") === "the quick brown fox jumps at 10 am on day 3")
  }

  test("redaction is idempotent (placeholders never re-match)") {
    val once = TextAnalysis.redactPii(Seq(
      (0L, "x jane@a.io 10.0.0.1 555-123-4567 078-05-1120 4111-1111-1111-1111 y"))
      .toDF("doc_id", "text"))
      .select(col("doc_id"), col("redacted").as("text"))
    val twice = TextAnalysis.redactPii(once).collect()(0)
    assert(twice.getAs[String]("redacted") ===
      "x <EMAIL> <IP> <PHONE> <SSN> <CC> y")
    for (t <- Seq("n_email", "n_cc", "n_ssn", "n_phone", "n_ipv4"))
      assert(twice.getAs[Long](t) === 0L, t)
  }

  test("null text is safe: zero counts, empty redacted string") {
    val out = TextAnalysis.redactPii(
      Seq(0L).toDF("doc_id").select(col("doc_id"), lit(null).cast("string").as("text")))
      .collect()(0)
    for (t <- Seq("n_email", "n_cc", "n_ssn", "n_phone", "n_ipv4"))
      assert(out.getAs[Long](t) === 0L, t)
    assert(out.getAs[String]("redacted") === "")
  }

  test("a doc can carry multiple types; counts are per-type on the original text") {
    val out = run(0L -> "a@b.co writes from 10.1.2.3 about 4111 1111 1111 1111")
    val r = out(0L)
    assert(r.getAs[Long]("n_email") === 1L)
    assert(r.getAs[Long]("n_ipv4") === 1L)
    assert(r.getAs[Long]("n_cc") === 1L)
    assert(r.getAs[String]("redacted") === "<EMAIL> writes from <IP> about <CC>")
  }

  test("mixed-case emails are redacted; placeholders still idempotent under (?i)") {
    import spark.implicits._
    val docs = Seq((1L, "Mail John.Doe@Example.COM or ADMIN@HOST.ORG today"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.redactPii(docs).collect().head
    assert(r.getAs[Long]("n_email") === 2L)
    assert(r.getAs[String]("redacted") === "Mail <EMAIL> or <EMAIL> today")
    val again = graft.operators.TextAnalysis.redactPii(
      Seq((1L, r.getAs[String]("redacted"))).toDF("doc_id", "text")).collect().head
    assert(again.getAs[String]("redacted") === r.getAs[String]("redacted"))
  }
}
