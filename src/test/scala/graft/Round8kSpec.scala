package graft

import graft.ops.{Behavior, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 11: Gopher rules, CUPED lift. */
class Round8kSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("gopherRules: each rule fires on its designed violator") {
    val good = ("s", ("the word list goes on and on with the full gopher " +
      "sentence that we have written out to be long enough ") * 3)
    val docs = Seq(
      good,                                        // passes all
      ("s", "ab " * 60),                           // mean word len 2 < 3
      ("s", ("## " * 30) + good._2),               // symbol ratio
      ("s", "table row scan " * 20),               // no stopword pair
      ("s", "tiny doc list")                       // word count < 50
    ).toDF("source", "text")
    val r = TextAnalysis.gopherRules(docs, "source", "text").head()
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_word_len") >= 1L)
    assert(r.getAs[Long]("n_symbol") === 1L)
    assert(r.getAs[Long]("n_stop") >= 2L)        // scan-doc + ab-doc
    assert(r.getAs[Long]("n_word_count") >= 1L)
    assert(r.getAs[Long]("n_kept") === 1L)       // only the good doc
  }

  test("gopherRules: null text degrades to the empty-doc path") {
    val docs = Seq(("s", null: String)).toDF("source", "text")
    val r = TextAnalysis.gopherRules(docs, "source", "text").head()
    assert(r.getAs[Long]("n_word_count") === 1L)
    assert(r.getAs[Long]("n_kept") === 0L)
  }

  test("cupedLift: hand case — perfect pre/post correlation → theta, rho2 = 1") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // y = x exactly per user: theta = 1, rho2 = 1, adjusted lift
    // removes all covariate imbalance
    val pre = t("2024-01-10 00:00:00"); val post = t("2024-01-20 00:00:00")
    val ev = (1L to 40L).flatMap { u =>
      Seq((u, pre, u.toDouble), (u, post, u.toDouble))
    }.toDF("user_id", "ts", "value")
    val r = Behavior.cupedLift(ev, "user_id", "ts", "value",
      "2024-01-16 00:00:00").head()
    assert(r.getAs[Long]("n") === 40L)
    assert(r.getAs[Long]("n_treat") + r.getAs[Long]("n_control") === 40L)
    assert(r.getAs[Double]("theta") === 1.0)
    assert(r.getAs[Double]("rho2") === 1.0)
    // y == x ⇒ raw lift equals covariate imbalance ⇒ adjusted lift 0
    assert(r.getAs[Double]("adj_lift") === 0.0)
  }

  test("cupedLift: no pre-period variance → theta and adj_lift NULL") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-20 00:00:00"), 5.0),
      (2L, t("2024-01-21 00:00:00"), 7.0)
    ).toDF("user_id", "ts", "value")
    val r = Behavior.cupedLift(ev, "user_id", "ts", "value",
      "2024-01-16 00:00:00").head()
    assert(r.isNullAt(r.fieldIndex("theta")))
    assert(r.isNullAt(r.fieldIndex("adj_lift")))
  }
}
