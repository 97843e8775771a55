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
}
