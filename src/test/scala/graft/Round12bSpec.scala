package graft

import graft.ops.Preferences
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 part 2: preference-data QA. Randomized comparisons are
  * checked against brute-force Scala counts; planted defects
  * (hand-built conflicts and a known 3-cycle) must surface exactly.
  */
class Round12bSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7L)
  // 400 random comparisons over 6 prompts x 8 completions
  private lazy val cmp = (1 to 400).map { _ =>
    val p = rnd.nextInt(6).toLong
    val a = rnd.nextInt(8).toLong
    val b = (a + 1 + rnd.nextInt(7)) % 8
    (p, a, b)
  }
  private lazy val cmpDf = cmp.toDF("prompt", "win", "lose")

  test("winRates matches brute force on random comparisons") {
    val got = Preferences.winRates(cmpDf, "prompt", "win", "lose")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6)))
      .toMap
    val wins = cmp.groupBy(c => (c._1, c._2)).view.mapValues(_.size.toLong)
    val losses = cmp.groupBy(c => (c._1, c._3)).view.mapValues(_.size.toLong)
    val keys = (wins.keySet ++ losses.keySet).toSeq
    assert(got.size === keys.size)
    keys.foreach { k =>
      val w = wins.getOrElse(k, 0L); val l = losses.getOrElse(k, 0L)
      val (gw, gl, gg, grate, gcope) = got(k)
      assert(gw === w && gl === l && gg === w + l, s"$k")
      assert(math.abs(grate - w.toDouble / (w + l)) < 1e-6 + 1e-9, s"$k rate")
      assert(gcope === w - l, s"$k copeland")
    }
  }

  test("conflictAudit: directions sum to the group's votes; conflicts iff both seen") {
    val got = Preferences.conflictAudit(cmpDf, "prompt", "win", "lose")
      .collect()
    val byPair = cmp.groupBy(c => (c._1, math.min(c._2, c._3), math.max(c._2, c._3)))
    assert(got.length === byPair.size)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1), r.getLong(2))
      val votes = byPair(key)
      val loWins = votes.count(c => c._2 < c._3).toLong
      assert(r.getLong(3) === loWins)
      assert(r.getLong(4) === votes.size - loWins)
      assert(r.getBoolean(5) === (loWins > 0 && loWins < votes.size))
      assert(r.getLong(6) === math.abs(2 * loWins - votes.size))
    }
  }

  test("majorityCycles finds a planted 3-cycle once and ignores transitive prompts") {
    // prompt 1: a>b (2:1), b>c, c>a — one majority cycle;
    // prompt 2: a>b, b>c, a>c — transitive, no cycle
    val planted = Seq(
      (1L, 10L, 11L), (1L, 10L, 11L), (1L, 11L, 10L),
      (1L, 11L, 12L), (1L, 12L, 10L),
      (2L, 10L, 11L), (2L, 11L, 12L), (2L, 10L, 12L)
    ).toDF("prompt", "win", "lose")
    val got = Preferences.majorityCycles(planted, "prompt", "win", "lose")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L))
  }

  test("a tied pair contributes no majority edge") {
    val tied = Seq((1L, 10L, 11L), (1L, 11L, 10L),
      (1L, 11L, 12L), (1L, 12L, 10L)).toDF("prompt", "win", "lose")
    // the 10-11 edge is tied away, so no triangle can close
    assert(Preferences.majorityCycles(tied, "prompt", "win", "lose")
      .collect().isEmpty)
  }

  test("raterAgreement: ties excluded from n_decided, all-tied rater gets NULL, self-pairs dropped") {
    // pair (10,11): 2 votes 10>11 (raters 0,1) vs 1 vote 11>10 (rater 2)
    //   → decided, majority = 10; pair (11,12): 1-1 tie (raters 0,2);
    // rater 3 votes ONLY on the tied pair → n_decided 0, agreement NULL
    // (a 2-2 tie after their vote); rater 4 casts a self-comparison —
    // dropped entirely per the normalized() contract
    val votes = Seq(
      (1L, 10L, 11L, 0L), (1L, 10L, 11L, 1L), (1L, 11L, 10L, 2L),
      (1L, 11L, 12L, 0L), (1L, 12L, 11L, 2L),
      (1L, 11L, 12L, 3L), (1L, 12L, 11L, 3L),
      (1L, 9L, 9L, 4L)
    ).toDF("prompt", "win", "lose", "rater")
    val got = Preferences.raterAgreement(votes, "prompt", "win", "lose",
        "rater").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(!got.contains(4L), "self-comparison-only rater must vanish")
    assert(got(0L) === ((2L, 1L, 1L, Some(1.0)))) // 10>11 decided+majority; 11-12 tied
    assert(got(1L) === ((1L, 1L, 1L, Some(1.0))))
    assert(got(2L) === ((2L, 1L, 0L, Some(0.0)))) // against the 10>11 majority
    assert(got(3L) === ((2L, 0L, 0L, None))) // only tied pairs → NULL
  }

  test("positionBias: self-pairs dropped, planted follower reads exactly 1.0") {
    val votes = Seq(
      (1L, 10L, 11L, 0L, 10L), // rater 0 picked the first-shown
      (1L, 10L, 11L, 0L, 11L), // ... and once the second-shown
      (1L, 11L, 12L, 3L, 11L), // rater 3 always first-shown
      (1L, 12L, 10L, 3L, 12L),
      (1L, 9L, 9L, 5L, 9L) // self-comparison: dropped
    ).toDF("prompt", "win", "lose", "rater", "first")
    val got = Preferences.positionBias(votes, "win", "lose", "first",
        "rater").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(!got.contains(5L), "self-comparison-only rater must vanish")
    assert(got(0L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((2L, 2L, 1.0)))
  }

  test("lengthBias: ties counted but excluded from the share; all-ties rater gets NULL") {
    // lengths: rater 0 votes longer-won then shorter-won then a tie;
    // rater 1 votes only equal-length pairs → NULL share
    val votes = Seq(
      (1L, 30L, 10L, 0L), // longer won
      (1L, 10L, 30L, 0L), // shorter won
      (1L, 20L, 20L, 0L), // tie
      (1L, 15L, 15L, 1L), (1L, 7L, 7L, 1L)
    ).toDF("prompt", "winlen", "loselen", "rater")
    val got = Preferences.lengthBias(votes, col("winlen"), col("loselen"),
        col("rater")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got(0L) === ((3L, 1L, 1L, Some(0.5))))
    assert(got(1L) === ((2L, 0L, 2L, None)))
  }
}
