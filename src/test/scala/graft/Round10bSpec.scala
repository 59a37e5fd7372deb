package graft

import graft.ops.MasterData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 2: incremental entity resolution ≡ full rebuild. */
class Round10bSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val keys = MasterData.prefixKeys(col("nm"), 4, 4)

  private def increment(stored: org.apache.spark.sql.DataFrame,
      batch: org.apache.spark.sql.DataFrame, cap: Int) = {
    val members = MasterData.linkageMembers(stored, "id", "nm", keys)
    MasterData.linkagePairsIncrement(members,
      MasterData.linkageBlockDfs(members),
      MasterData.linkagePairsByKeys(stored, "id", "nm", keys,
        maxDist = 1, maxBlockDf = cap),
      batch, "id", "nm", keys, maxDist = 1, maxBlockDf = cap)
  }

  test("increment equals full rebuild, including batch-stored and batch-batch pairs") {
    val stored = Seq((1L, "abcd-one"), (2L, "abcd-onz"), (9L, "wxyz-nine"))
      .toDF("id", "nm")
    val batch = Seq((11L, "abcd-oni"), (12L, "abcd-oni"), (13L, "qqqq-x"))
      .toDF("id", "nm")
    val inc = increment(stored, batch, cap = 64)
      .select("id_a", "id_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = MasterData.linkagePairsByKeys(
        stored.unionByName(batch), "id", "nm", keys,
        maxDist = 1, maxBlockDf = 64)
      .select("id_a", "id_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === full)
    assert(inc.contains((11L, 12L))) // batch-batch, found once
    assert(inc.contains((1L, 11L)))  // batch-stored
    assert(inc.contains((1L, 2L)))   // stored-stored kept
  }

  test("a block the batch pushes over the cap retracts its stored pairs") {
    val stored = Seq((1L, "hot-a"), (2L, "hot-b"), (3L, "hot-c"))
      .toDF("id", "nm")
    val batch = Seq((11L, "hot-d"), (12L, "hot-e")).toDF("id", "nm")
    // cap 4: stored block 'hot-' holds 3 (kept, has stored pairs);
    // stored+batch = 5 > 4 -> hot now -> NO pairs at all
    val inc = increment(stored, batch, cap = 4).count()
    assert(inc === 0L)
    val full = MasterData.linkagePairsByKeys(
      stored.unionByName(batch), "id", "nm", keys,
      maxDist = 1, maxBlockDf = 4).count()
    assert(full === 0L)
  }

  test("randomized increment ≡ rebuild across caps and splits") {
    val rnd = new scala.util.Random(42)
    val corpus = (1L to 60L).map { i =>
      val base = s"w${rnd.nextInt(4)}-v${rnd.nextInt(3)}-${i % 7}"
      (i, if (rnd.nextBoolean()) base else base.dropRight(1) + "z")
    }
    for (cap <- Seq(3, 6, 64); cut <- Seq(10L, 30L, 50L)) {
      val stored = corpus.filter(_._1 > cut).toDF("id", "nm")
      val batch = corpus.filter(_._1 <= cut).toDF("id", "nm")
      val inc = increment(stored, batch, cap)
        .select("id_a", "id_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = MasterData.linkagePairsByKeys(
          corpus.toDF("id", "nm"), "id", "nm", keys,
          maxDist = 1, maxBlockDf = cap)
        .select("id_a", "id_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(inc === full, s"cap=$cap cut=$cut")
    }
  }

  test("resolveEntitiesIncrement labels the full corpus like resolveEntities") {
    val stored = Seq((1L, "abcd-one"), (2L, "abcd-onz"), (9L, "wxyz-nine"))
      .toDF("id", "nm")
    val batch = Seq((11L, "abcd-ons")).toDF("id", "nm")
    val members = MasterData.linkageMembers(stored, "id", "nm", keys)
    val got = MasterData.resolveEntitiesIncrement(
        stored.unionByName(batch), "id", members,
        MasterData.linkageBlockDfs(members),
        MasterData.linkagePairsByKeys(stored, "id", "nm", keys,
          maxDist = 1, maxBlockDf = 64),
        batch, "nm", keys, maxDist = 1, maxBlockDf = 64)
      .orderBy("id").collect()
    val want = MasterData.resolveEntitiesByKeys(
        stored.unionByName(batch), "id", "nm", keys,
        maxDist = 1, maxBlockDf = 64)
      .orderBy("id").collect()
    assert(got.toSeq === want.toSeq)
  }
}
