package graft

import graft.ops.{Classify, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 14: centroid classifier, mojibake audit. */
class Round8nSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The operator's split rule, replayed host-side. */
  private def isTrain(id: Long): Boolean = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"cls:$id".getBytes("UTF-8"))
    "%02x".format(h(0)).charAt(0) < 'c'
  }

  test("centroidConfusion: disjoint vocabularies classify perfectly") {
    val docs = (1L to 80L).map { i =>
      if (i % 2 == 0) (i, "a", "apple fruit basket orchard")
      else (i, "b", "car engine wheel road")
    }.toDF("doc_id", "source", "text")
    val r = Classify.centroidConfusion(docs, "doc_id", "source", "text")
      .collect()
    val nTest = (1L to 80L).count(!isTrain(_))
    assert(r.map(_.getAs[Long]("n_docs")).sum === nTest)
    // each source certainly has train docs at n=40; with disjoint
    // vocab a test doc only ever scores its own centroid
    assert(r.forall(x =>
      x.getAs[String]("true_source") == x.getAs[String]("pred_source")))
  }

  test("centroidConfusion: doc sharing no token with any centroid → none") {
    // one source trains on 'alpha'; a second source's docs are pure
    // OOV gibberish, so every test gibberish doc must map to 'none'
    val docs = ((1L to 40L).map(i => (i, "a", "alpha beta gamma")) ++
      (41L to 60L).map(i => (i, "z", s"zz${i}qq"))).toDF(
      "doc_id", "source", "text")
    val r = Classify.centroidConfusion(docs, "doc_id", "source", "text")
      .collect()
    val zRows = r.filter(_.getAs[String]("true_source") == "z")
    assert(zRows.forall(_.getAs[String]("pred_source") == "none"))
  }

  test("mojibakeAudit: marker occurrences counted exactly") {
    val docs = Seq(
      ("s", "caf\u00C3\u00A9 ok"),                 // 1× Ã
      ("s", "clean doc"),
      ("s", "\u00E2\u20AC\u0153q \uFFFD")          // 1× â€ + 1× �
    ).toDF("source", "text")
    val r = TextAnalysis.mojibakeAudit(docs, "source", "text").head()
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("n_mojibake") === 2L)
    assert(r.getAs[Long]("n_marks") === 3L)
    assert(r.getAs[Double]("mojibake_rate") === 0.666667)
  }
}
