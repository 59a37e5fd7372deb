package graft

import graft.ops.{Packing, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-6 operators: sequence packing must
  * agree with the sequential fold on random corpora (any block size),
  * and repetition stats must respect their algebraic bounds. Raw
  * ScalaCheck Gen with a fixed seed, as CcPropertySpec.
  */
class Round6PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // random corpus: (doc_id, text of k words); ids sparse + shuffled to
  // exercise blocks of uneven fill
  private val corpusGen = for {
    n <- Gen.choose(1, 60)
    ids <- Gen.pick(n, 0L until 500L)
    sizes <- Gen.listOfN(n, Gen.choose(0, 30))
  } yield ids.toSeq.zip(sizes).map { case (id, k) =>
    (id, Seq.fill(k)("w").mkString(" "))
  }

  test("packSequences equals the sequential fold on random corpora") {
    import spark.implicits._
    val params = Seed(42L)
    (0 until 12).foldLeft(params) { (seed, _) =>
      val corpus = corpusGen.pureApply(Gen.Parameters.default, seed)
      val blockSize = Gen.choose(1, 50).pureApply(Gen.Parameters.default, seed.next)
      val seqTokens = Gen.choose(1, 64).pureApply(Gen.Parameters.default, seed.next.next)
      // exercise every recursion depth, including levels where
      // blockSize^levels overshoots or undershoots the id range
      val levels = Gen.choose(1, 3).pureApply(Gen.Parameters.default, seed.next.next.next)
      val out = Packing.packSequences(corpus.toDF("doc_id", "text"),
          "doc_id", "text", seqTokens, blockSize, levels)
        .orderBy(col("doc_id")).collect()
      var off = 0L
      corpus.sortBy(_._1).zip(out).foreach { case ((id, text), row) =>
        assert(row.getLong(0) === id)
        val n = row.getLong(1)
        assert(row.getLong(2) === off / seqTokens && row.getLong(3) === off % seqTokens,
          s"doc $id (seqTokens=$seqTokens blockSize=$blockSize levels=$levels): expected offset $off")
        off += n
      }
      seed.next.next.next
    }
  }

  test("repetitionStats bounds hold on random texts") {
    import spark.implicits._
    val textGen = for {
      k <- Gen.choose(0, 40)
      words <- Gen.listOfN(k, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield words.mkString(" ")
    val texts = (0 until 40).foldLeft((Seed(7L), Vector.empty[String])) {
      case ((seed, acc), _) =>
        (seed.next, acc :+ textGen.pureApply(Gen.Parameters.default, seed))
    }._2
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = df.select(Seq(col("doc_id")) ++ TextAnalysis.repetitionStats(col("text"), 3): _*)
      .collect()
    rows.foreach { r =>
      val (tot, dis, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dis >= 0 && dis <= tot, r.toString)
      assert(ratio >= 0.0 && ratio < 1.0, r.toString)
      // ratio is exactly 1 - distinct/total (rounded) when any n-grams exist
      if (tot > 0)
        assert(math.abs(ratio - BigDecimal(1.0 - dis.toDouble / tot.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12, r.toString)
    }
  }
}
