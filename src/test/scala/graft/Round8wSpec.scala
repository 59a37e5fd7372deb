package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 23: match-span explanation. */
class Round8wSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matchSpans: diagonal island finds the copied block exactly") {
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "x c d e f g"),
      (3L, "p q r s t")
    ).toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.matchSpans(docs, "id", "text", pairs, n = 3).head()
    // common run c..g: A positions 3..7, B positions 2..6 → 3 grams
    assert(r.getAs[Long]("start_a") === 3L)
    assert(r.getAs[Long]("start_b") === 2L)
    assert(r.getAs[Long]("len_ngrams") === 3L)
    assert(r.getAs[Long]("len_tokens") === 5L)
  }

  test("matchSpans: two separated copies → the longer span wins") {
    val docs = Seq(
      (1L, "a b c d e u v w x y z1 z2 m n o p"),
      (2L, "c d e k1 k2 m n o p")
    ).toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.matchSpans(docs, "id", "text", pairs, n = 3).collect()
    assert(r.length === 1)
    // 'm n o p' (2 grams) beats 'c d e' (1 gram)
    assert(r(0).getAs[Long]("len_ngrams") === 2L)
    assert(r(0).getAs[Long]("len_tokens") === 4L)
    assert(r(0).getAs[Long]("start_a") === 13L)
    assert(r(0).getAs[Long]("start_b") === 6L)
  }

  test("matchSpans: pair with no common gram yields no row") {
    val docs = Seq((1L, "a b c d"), (2L, "w x y z")).toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    assert(Dedup.matchSpans(docs, "id", "text", pairs, n = 3)
      .collect().isEmpty)
  }

  test("matchSpans: sub-n-token / empty docs in the corpus don't crash the query") {
    // r9 regression (ADVICE r8): sequence(1, 0) is the DESCENDING
    // [1, 0] and slice(toks, 0, n) threw — one short doc anywhere in
    // the corpus killed the whole query even when it was in no pair
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "z a b c d e f"),
      (3L, "tiny"), (4L, ""), (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val r = Dedup.matchSpans(docs, "id", "text", pairs, n = 3).collect()
    assert(r.length === 1) // the short-doc pair has no grams at all
    assert(r.head.getAs[Long]("len_ngrams") === 4L)
  }
}
