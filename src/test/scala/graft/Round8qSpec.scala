package graft

import graft.ops.Classify
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 17: learning curve. */
class Round8qSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("learningCurve: fixed test set, nested trains, monotone coverage") {
    val docs = (1L to 120L).map { i =>
      if (i % 2 == 0) (i, "a", "apple fruit basket orchard")
      else (i, "b", "car engine wheel road")
    }.toDF("doc_id", "source", "text")
    val r = Classify.learningCurve(docs, "doc_id", "source", "text")
      .orderBy(col("train_frac")).collect()
    assert(r.length === 3)
    // one fixed held-out set: n_test identical at every point
    assert(r.map(_.getAs[Long]("n_test")).distinct.length === 1)
    // nested trains only ever add centroid vocabulary
    val cov = r.map(_.getAs[Double]("coverage")).toSeq
    assert(cov === cov.sorted)
    // disjoint vocabularies: every scored doc is scored correctly
    r.foreach { x =>
      assert(x.getAs[Long]("n_correct") === x.getAs[Long]("n_predicted"))
      assert(x.getAs[Double]("accuracy") === x.getAs[Double]("coverage"))
    }
  }
}
