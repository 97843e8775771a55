package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.pipeline.Curate
import graft.tables.Tables

class CurateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("curation stats conserve the corpus and kept set is near-dup free") {
    val (curated, s) = Curate.run(spark, dir)
    assert(s.input === s.exactDups + s.nearDups + s.lowQuality + s.unknownLang + s.kept)
    assert(curated.count() === s.kept && s.kept > 0)
    // no surviving near-dup pair: re-running LSH on the curated set with
    // the same threshold finds nothing
    assert(Dedup.minhashLshPairs(curated).count() === 0)
    // determinism
    val (_, s2) = Curate.run(spark, dir)
    assert(s === s2)
  }

  test("releaseCaches drops every frame a Curate run persisted") {
    val (curated, _) = Curate.run(spark, dir)
    curated.count() // the caller's terminal action
    // a run releases Dedup's shingle/band/capped frames inside runDocs and
    // leaves only the frame backing `curated` (plus any earlier tests')
    assert(Curate.releaseCaches(spark) >= 1)
    // idempotent and empty afterwards: nothing left tracked on the session
    assert(Curate.releaseCaches(spark) === 0)
    assert(Dedup.releaseCaches(spark) === 0)
    // and a direct operator call tracks its own frames until released
    Dedup.minhashLshPairs(Tables.documents(spark, dir)).count()
    assert(Dedup.releaseCaches(spark) >= 3)
    assert(Dedup.releaseCaches(spark) === 0)
  }

  test("zero-token docs are accounted as lowQuality, not silently dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "!!!"), // tokenless: no quality row without the left join
      (2L, "the quick brown fox jumps over the lazy dog and the cat and the bird today"),
      (3L, "der hund und die katze sind nicht der fisch und das brot und der mann hier"))
      .toDF("doc_id", "text")
    val (curated, s) = Curate.runDocs(spark, docs, minQuality = 0.1)
    assert(s.input === 3)
    assert(s.input === s.exactDups + s.nearDups + s.lowQuality + s.unknownLang + s.kept)
    assert(s.lowQuality >= 1) // the tokenless doc
    assert(curated.filter($"doc_id" === 1L).count() === 0)
  }
}
