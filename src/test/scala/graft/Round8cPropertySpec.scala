package graft

import graft.ops.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-8c operators, replayed against
  * brute-force Scala models on random corpora (fixed-seed raw
  * ScalaCheck Gen, the CcPropertySpec convention).
  */
class Round8cPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val words = Vector("the", "fox", "jumps", "over", "spark", "row",
    "scan", "data", "merge", "batch")

  // multi-line docs: 0-4 lines of 0-6 words each
  private val linedCorpusGen = for {
    n <- Gen.choose(1, 25)
    ids <- Gen.pick(n, 0L until 100L)
    texts <- Gen.listOfN(n, Gen.choose(0, 4).flatMap(l =>
      Gen.listOfN(l, Gen.choose(0, 6).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf(words)).map(_.mkString(" "))))
        .map(_.mkString("\n"))))
  } yield ids.toSeq.zip(texts)

  test("lineDedup equals the brute-force boilerplate model on random corpora") {
    import spark.implicits._
    (0 until 8).foldLeft(Seed(31L)) { (seed, _) =>
      val corpus = linedCorpusGen.pureApply(Gen.Parameters.default, seed)
      val got = Dedup.lineDedup(corpus.toDF("id", "text"), "id", "text",
          minDocs = 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      // model: trimmed non-blank lines; boilerplate = line in >= 2 docs
      val docLines = corpus.map { case (id, t) =>
        id -> t.split("\n", -1).map(_.trim).filter(_.nonEmpty).toSeq }.toMap
      val boiler = docLines.toSeq.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      docLines.foreach { case (id, ls) =>
        if (ls.isEmpty) assert(!got.contains(id), s"seed $seed id $id")
        else {
          val kept = ls.filterNot(boiler)
          assert(got(id) === ((ls.size.toLong, kept.size.toLong,
            kept.mkString("\n"))), s"seed $seed id $id")
        }
      }
      seed.next
    }
  }

  test("epochShards is a dense permutation per shard for random id sets") {
    import spark.implicits._
    (0 until 6).foldLeft(Seed(37L)) { (seed, _) =>
      val ids = Gen.choose(1, 60).flatMap(n => Gen.pick(n, 0L until 500L))
        .pureApply(Gen.Parameters.default, seed).toSeq
      val out = Sampling.epochShards(ids.toDF("id"), "id", epoch = 2, nShards = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(out.map(_._1).sorted === ids.sorted, s"seed $seed") // bijection
      out.groupBy(_._2).foreach { case (_, rows) =>
        assert(rows.map(_._3).sorted.toSeq === (0L until rows.size).toSeq,
          s"seed $seed")
      }
      seed.next
    }
  }

  test("vocabCoverage: coverage is monotone in vocab size, exact totals") {
    import spark.implicits._
    (0 until 6).foldLeft(Seed(41L)) { (seed, _) =>
      val texts = Gen.choose(1, 20).flatMap(n => Gen.listOfN(n,
          Gen.choose(0, 12).flatMap(k =>
            Gen.listOfN(k, Gen.oneOf(words)).map(_.mkString(" ")))))
        .pureApply(Gen.Parameters.default, seed)
      val total = texts.flatMap(_.split("\\s+")).count(_.nonEmpty).toLong
      if (total > 0) {
        val out = TextAnalysis.vocabCoverage(texts.map(Tuple1(_)).toDF("text"),
            "text", Seq(1, 3, 100))
          .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
          .sortBy(_._1)
        assert(out.map(_._2).toSeq === out.map(_._2).sorted, s"seed $seed")
        assert(out.last._2 === total && out.last._3 === 1.0, s"seed $seed")
        assert(out.forall(o => o._2 <= total), s"seed $seed")
      }
      seed.next
    }
  }

  test("sourceDivergence: KL >= 0 (Gibbs) and zero for a lone source") {
    import spark.implicits._
    (0 until 6).foldLeft(Seed(43L)) { (seed, _) =>
      val corpus = Gen.choose(2, 20).flatMap(n => Gen.listOfN(n, for {
          src <- Gen.oneOf("s0", "s1", "s2")
          k <- Gen.choose(1, 10)
          ws <- Gen.listOfN(k, Gen.oneOf(words))
        } yield (src, ws.mkString(" "))))
        .pureApply(Gen.Parameters.default, seed)
      val out = TextAnalysis.sourceDivergence(corpus.toDF("source", "text"),
          "source", "text")
        .collect().map(r => r.getString(0) -> r.getDouble(3))
      assert(out.forall(_._2 >= 0.0), s"seed $seed") // Gibbs' inequality
      if (out.length == 1) assert(out.head._2 === 0.0, s"seed $seed")
      seed.next
    }
  }

  test("contaminationSpans invariants: spans cover hits, each span >= n tokens") {
    import spark.implicits._
    val corpusGen = for {
      n <- Gen.choose(2, 16)
      ids <- Gen.pick(n, 0L until 100L)
      texts <- Gen.listOfN(n, Gen.choose(3, 20).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf(words)).map(_.mkString(" "))))
    } yield ids.toSeq.zip(texts)
    (0 until 6).foldLeft(Seed(47L)) { (seed, _) =>
      val corpus = corpusGen.pureApply(Gen.Parameters.default, seed)
      val (ev, tr) = corpus.partition(_._1 % 2 == 0)
      if (ev.nonEmpty && tr.nonEmpty) {
        val out = Dedup.contaminationSpans(ev.toDF("id", "text"),
            tr.toDF("id", "text"), "id", "text", n = 3)
          .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        out.foreach { case (hits, spans, covered, maxSpan) =>
          assert(hits >= spans, s"seed $seed")
          assert((spans == 0 && covered == 0 && maxSpan == 0) ||
            (covered >= spans * 3 && maxSpan <= covered && maxSpan >= 3),
            s"seed $seed")
        }
        assert(out.length === ev.size, s"seed $seed") // every eval doc present
      }
      seed.next
    }
  }
}
