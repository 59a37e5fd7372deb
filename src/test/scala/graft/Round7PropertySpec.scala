package graft

import graft.ops.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-7 operators: every one is exactly
  * deterministic, so each is replayed against a brute-force Scala
  * model on random corpora. Raw ScalaCheck Gen with a fixed seed, as
  * CcPropertySpec / Round6PropertySpec.
  */
class Round7PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val words = Vector("the", "fox", "jumps", "over", "spark", "row",
    "scan", "data", "merge", "batch")

  private val corpusGen = for {
    n <- Gen.choose(1, 40)
    ids <- Gen.pick(n, 0L until 200L)
    texts <- Gen.listOfN(n, Gen.choose(0, 25).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(words)).map(_.mkString(" "))))
  } yield ids.toSeq.zip(texts)

  test("bpePairStep equals the brute-force pair count on random corpora") {
    import spark.implicits._
    (0 until 8).foldLeft(Seed(7L)) { (seed, _) =>
      val corpus = corpusGen.pureApply(Gen.Parameters.default, seed)
      val got = TextAnalysis.bpePairStep(corpus.toDF("id", "text"), "text", topK = 1000)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // brute force: word frequency, then adjacent char pairs per word
      val wc = corpus.flatMap(_._2.toLowerCase.trim.split("\\s+"))
        .filter(_.length >= 2).groupBy(identity).view.mapValues(_.size.toLong)
      val want = wc.toSeq.flatMap { case (w, c) =>
        w.sliding(2).map(p => p -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(got === want, s"seed $seed")
      seed.next
    }
  }

  test("substringDupStats equals the brute-force k-gram model on random corpora") {
    import spark.implicits._
    val k = 12; val stride = 5
    (0 until 8).foldLeft(Seed(11L)) { (seed, _) =>
      val corpus = corpusGen.pureApply(Gen.Parameters.default, seed)
      val got = Dedup.substringDupStats(corpus.toDF("id", "text"), "id", "text",
          k = k, stride = stride)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      // brute force over normalized text
      val grams = corpus.flatMap { case (id, text) =>
        val t = text.toLowerCase.trim
        if (t.length >= k) (0 to t.length - k by stride).map(i => id -> t.substring(i, i + k))
        else Seq.empty
      }
      val occ = grams.groupBy(_._2).view.mapValues(_.size).toMap
      val want = corpus.map { case (id, _) =>
        val mine = grams.filter(_._1 == id).map(_._2)
        id -> ((mine.size.toLong, mine.count(g => occ(g) >= 2).toLong))
      }.toMap
      assert(got === want, s"seed $seed")
      seed.next
    }
  }

  test("sourceOverlapMatrix equals brute-force distinct-shingle Jaccard") {
    import spark.implicits._
    val srcGen = for {
      corpus <- corpusGen
      srcs <- Gen.listOfN(corpus.size, Gen.oneOf("a", "b", "c"))
    } yield corpus.zip(srcs).map { case ((_, t), s) => (s, t) }
    (0 until 8).foldLeft(Seed(13L)) { (seed, _) =>
      val rows = srcGen.pureApply(Gen.Parameters.default, seed)
      val got = Dedup.sourceOverlapMatrix(rows.toDF("source", "text"), "source", "text", n = 2)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      // brute force: per source, distinct 2-gram string shingles with
      // the short-doc whole-array rule (matches shingleHashesFrom)
      def shingles(t: String): Set[Seq[String]] = {
        val toks = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.size >= 2) toks.sliding(2).toSet
        else if (toks.nonEmpty) Set(toks)
        else Set.empty
      }
      val bySrc = rows.groupBy(_._1).view
        .mapValues(_.flatMap(r => shingles(r._2)).toSet).toMap
      val want = (for {
        (sa, sha) <- bySrc; (sb, shb) <- bySrc if sa < sb
        inter = (sha & shb).size if inter > 0
      } yield (sa, sb) -> ((sha.size.toLong, shb.size.toLong, inter.toLong))).toMap
      assert(got === want, s"seed $seed")
      seed.next
    }
  }

  test("temperatureSample equals the exact md5-threshold model on random corpora") {
    import spark.implicits._
    val srcGen = for {
      n <- Gen.choose(2, 60)
      ids <- Gen.pick(n, 0L until 300L)
      srcs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield ids.toSeq.zip(srcs)
    (0 until 8).foldLeft(Seed(17L)) { (seed, _) =>
      val rows = srcGen.pureApply(Gen.Parameters.default, seed)
      val alpha = 0.6; val target = 0.4
      val got = Sampling.temperatureSample(rows.toDF("id", "src"), "id", "src",
          alpha = alpha, targetFraction = target)
        .select("id").collect().map(_.getLong(0)).toSet
      // brute force: rates from the same formula, membership via md5
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      val nTotal = rows.size.toDouble
      val wTotal = counts.values.map(math.pow(_, alpha)).sum
      val md = java.security.MessageDigest.getInstance("MD5")
      val want = rows.filter { case (id, src) =>
        val rate = math.pow(counts(src), alpha) / wTotal * nTotal * target / counts(src)
        if (rate >= 1.0) true
        else {
          val hex = md.digest(id.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.substring(0, 4)
          val thr = "%04x".format(math.floor(rate * 65536).toLong)
          hex < thr
        }
      }.map(_._1).toSet
      assert(got === want, s"seed $seed")
      seed.next
    }
  }
}
