package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions

/** GraftExtensions (SparkSessionExtensions injection): a session the engine
  * does not construct gets the full SQL function surface, with semantics
  * identical to the per-session GraftFunctions.register path (both read
  * GraftFunctions.builders). The extension session shares the test
  * SparkContext — only session state differs. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val orig = SparkTestSession.spark

  private def withExtensionSession[T](f: SparkSession => T): T = {
    orig // force the shared session (and its SparkContext) to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
      f(s)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("injected functions resolve in SQL without GraftFunctions.register") {
    withExtensionSession { s =>
      val toks = s.sql("SELECT word FROM (SELECT 1) LATERAL VIEW tokenize('Fast, Fast KEY-9') t AS word")
        .collect().map(_.getString(0)).toSeq
      assert(toks === Seq("fast", "fast", "key", "9"))
      val h = s.sql("SELECT md5_prefix32('abc') AS h").collect()(0).getLong(0)
      val expect = orig.sql(
        "SELECT conv(substring(md5('abc'), 1, 8), 16, 10)").collect()(0).getString(0).toLong
      assert(h === expect)
      val cos = s.sql(
        "SELECT cosine_fused(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect()(0).getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
    }
  }

  test("injection and per-session registration agree (shared builder list)") {
    val q = "SELECT hyperplane_sketch(array(0.5D, -0.25D, 1.0D), 3, 8) AS s"
    val viaExtension = withExtensionSession(_.sql(q).collect()(0).getLong(0))
    val viaRegister = orig.sql(q).collect()(0).getLong(0)
    assert(viaExtension === viaRegister)
  }
}
