package graft

import graft.ops.MasterData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 1: generalized blocking keys, the dropped-block
  * audit, and probe-pair reachability.
  */
class Round10aSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val residueKeys = Seq(
    "even" -> regexp_replace(substring(col("nm"), 2, 100), "(.).", "$1"),
    "odd" -> regexp_replace(col("nm"), "(.).", "$1"))

  test("residue keys: a substitution at any position is caught by the other pass") {
    val df = Seq(
      (1L, "abcdef"), (2L, "Xbcdef"), // pos 1 (odd) edit -> even pass
      (3L, "uvwxyz"), (4L, "uXwxyz"), // pos 2 (even) edit -> odd pass
      (5L, "kkkkkk"), (6L, "kXkXkk")  // dist 2: never verified
    ).toDF("id", "nm")
    val got = MasterData.linkagePairsByKeys(df, "id", "nm", residueKeys,
        maxDist = 1, maxBlockDf = 64)
      .select("pass", "id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("even", 1L, 2L), ("odd", 3L, 4L)))
  }

  test("linkagePairsByKeys keeps per-pass provenance; linkagePairs dedups across passes") {
    // identical strings pair in BOTH passes
    val df = Seq((1L, "samesame"), (2L, "samesame")).toDF("id", "nm")
    val prov = MasterData.linkagePairsByKeys(df, "id", "nm", residueKeys,
      maxDist = 1, maxBlockDf = 64)
    assert(prov.count() === 2L)
    val dedup = MasterData.linkagePairs(df, "id", "nm", prefixLen = 4,
      maxDist = 1, maxBlockDf = 64)
    assert(dedup.count() === 1L)
  }

  test("linkageAudit: dropped blocks, their rows, and kept blocks are counted per pass") {
    // fwd pass: one hot block of 5 ('aaaa*'), one kept block of 2
    val df = ((0L until 5L).map(i => (i, s"aaaa-$i")) ++
      Seq((10L, "bbbb-x"), (11L, "bbbb-y"))).toDF("id", "nm")
    val out = MasterData.linkageAudit(df, "id", "nm",
        MasterData.prefixKeys(col("nm"), 4, 6), maxBlockDf = 4)
      .orderBy("pass").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // rev pass: reverse prefixes '0-aaaa'.. are all distinct -> 7 kept
    assert(out.toSeq === Seq(("fwd", 1L, 5L, 1L), ("rev", 0L, 0L, 7L)))
  }

  test("pairReachability: a pair only inside a dropped block reports unreachable") {
    val df = ((0L until 5L).map(i => (i, s"aaaa-$i")) ++
      Seq((10L, "bbbb-x"), (11L, "bbbb-y"))).toDF("id", "nm")
    val probes = Seq((0L, 1L), (10L, 11L), (0L, 10L)).toDF("id_a", "id_b")
    val got = MasterData.pairReachability(df, "id", "nm",
        MasterData.prefixKeys(col("nm"), 4, 6), maxBlockDf = 4, probes)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq(
      (0L, 1L, false),   // only shared block is hot 'aaaa' -> dropped
      (0L, 10L, false),  // never share a block at all
      (10L, 11L, true))) // small 'bbbb' block survives
  }

  test("length pre-filter never changes results: len-diff > maxDist pairs are out anyway") {
    val df = Seq((1L, "abcd"), (2L, "abcdXY")).toDF("id", "nm")
    // same fwd block 'abcd', levenshtein = 2 > 1 either way
    assert(MasterData.linkagePairs(df, "id", "nm", prefixLen = 4,
      maxDist = 1, maxBlockDf = 64).count() === 0L)
    // at maxDist 2 the pair IS found (the guard admits len-diff 2)
    assert(MasterData.linkagePairs(df, "id", "nm", prefixLen = 4,
      maxDist = 2, maxBlockDf = 64).count() === 1L)
  }

  test("resolveEntitiesByKeys matches resolveEntities on a substitution corpus") {
    val df = Seq(
      (1L, "alpha-bravo"), (2L, "alpha-bravz"),
      (3L, "hotel-india"), (9L, "julie-echox")
    ).toDF("id", "nm")
    val a = MasterData.resolveEntities(df, "id", "nm", prefixLen = 6,
      maxDist = 1, maxBlockDf = 64).orderBy("id").collect().toSeq
    val b = MasterData.resolveEntitiesByKeys(df, "id", "nm", residueKeys,
      maxDist = 1, maxBlockDf = 64).orderBy("id").collect().toSeq
    assert(a === b)
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L), (2L, 1L), (3L, 3L), (9L, 9L)))
  }
}
