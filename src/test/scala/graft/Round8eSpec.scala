package graft

import graft.ops.{Dedup, Profile, TextAnalysis}
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 5: novelty, dedup sweep, span corruption, CDC
  * chunking, lateness audit.
  */
class Round8eSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  // ---- noveltyScores ----

  test("noveltyScores: copies score 0, fresh text scores 1") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // copy of 1
      (3L, "zeta eta theta iota kappa"))      // all fresh
      .toDF("id", "text")
    val out = Dedup.noveltyScores(df, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((3L, 3L, 1.0)))
    assert(out(2L) === ((3L, 0L, 0.0)))
    assert(out(3L) === ((3L, 3L, 1.0)))
  }

  test("noveltyScores: partial overlap counts shared shingles once") {
    val df = Seq(
      (1L, "a b c d"),        // shingles: abc, bcd
      (2L, "a b c x"))        // shingles: abc (seen), bcx (novel)
      .toDF("id", "text")
    val out = Dedup.noveltyScores(df, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) === 1.0)
    assert(out(2L) === 0.5)
  }

  // ---- dedupSweep ----

  test("dedupSweep: counts are monotone non-increasing in threshold " +
      "and exact on a planted corpus") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val df = Seq(
      (1L, base), (2L, base),                     // J = 1.0 pair
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 zz"),      // J < 1 vs 1/2
      (4L, "u1 u2 u3 u4 u5"))
      .toDF("id", "text")
    val out = Dedup.dedupSweep(df, "id", "text", Seq(0.5, 0.9, 1.0))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // doc 3 vs 1/2: shingles 8 each, 7 shared → J = 7/9 ≈ 0.78
    assert(out(0.5) === ((3L, 2L)))  // pairs (1,2),(1,3),(2,3); dropped 2,3
    assert(out(0.9) === ((1L, 1L)))  // only the exact pair
    assert(out(1.0) === ((1L, 1L)))
    val counts = out.toSeq.sortBy(_._1).map(_._2._1)
    assert(counts === counts.sorted.reverse)
  }

  // ---- spanCorrupt ----

  test("spanCorrupt: sentinels, counts, and surviving tokens reconcile") {
    val words = (0 until 30).map(i => s"w$i").mkString(" ")
    val df = Seq((5L, words), (6L, "a b"), (7L, "")).toDF("id", "text")
    val out = TextAnalysis.spanCorrupt(df, "id", "text",
        stride = 8, spanLen = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5)))).toMap
    val (n, nSpans, masked, corrupted) = out(5L)
    assert(n === 30L)
    val off = h60("mask:5") % 8
    val expectSpans = if (30 > off) (30 - 1 - off) / 8 + 1 else 0L
    assert(nSpans === expectSpans)
    // every span start becomes one sentinel; interiors drop
    val toks = corrupted.split(" ")
    assert(toks.count(_.startsWith("<extra_id_")) === nSpans)
    assert(toks.length.toLong === n - masked + nSpans)
    // untouched prefix survives verbatim
    assert(toks.take(off.toInt) === (0 until off.toInt).map(i => s"w$i"))
    // short doc: spans clip at doc end; empty doc: all zeros
    val (n6, s6, m6, _) = out(6L)
    assert(n6 === 2L && m6 <= 2L && s6 <= 1L)
    assert(out(7L) === ((0L, 0L, 0L, "")))
  }

  // ---- cdcChunkStats ----

  test("cdcChunkStats: matches brute-force chunking; boundaries are " +
      "content-defined (prefix edits don't shift later chunks)") {
    // find real boundary tokens under the operator's hash rule
    val vocab = (0 until 200).map(i => s"t$i")
    def isB(t: String): Boolean = h60(s"cdc:$t") % 16 == 0
    val bTok = vocab.find(isB).get
    val plain = vocab.filterNot(isB).take(6)
    def chunksOf(toks: Seq[String]): Seq[Seq[String]] = {
      val out = scala.collection.mutable.Buffer[Seq[String]]()
      var cur = scala.collection.mutable.Buffer[String]()
      toks.foreach { t =>
        cur += t
        if (isB(t)) { out += cur.toSeq; cur = scala.collection.mutable.Buffer() }
      }
      if (cur.nonEmpty) out += cur.toSeq
      out.toSeq
    }
    val docA = (plain.take(3) :+ bTok) ++ plain.drop(3)
    val docB = Seq("zzz") ++ docA // prefix edit
    val df = Seq((1L, docA.mkString(" ")), (2L, docB.mkString(" ")))
      .toDF("id", "text")
    val row = Profile.cdcChunkStats(df, "id", "text", modulus = 16)
      .collect().head
    val all = Seq(docA, docB).flatMap(chunksOf)
    assert(row.getAs[Long]("n_chunks") === all.length.toLong)
    assert(row.getAs[Long]("n_distinct_chunks") ===
      all.map(_.mkString(" ")).distinct.length.toLong)
    // the content-defined property: docB's post-boundary chunk equals
    // docA's — the prefix edit stayed contained in the first chunk
    assert(chunksOf(docA).last === chunksOf(docB).last)
    assert(row.getAs[Long]("n_dup_chunks") === 1L)
  }

  // ---- latenessProfile ----

  test("latenessProfile: matches the single-window running max, " +
      "including cross-block carries and ties") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // event i has ts t0 + i minutes, but arrival order scrambles some:
    // every 7th event arrives 11 slots late; arrival ties at %13
    val events = (0L until 200L).map { i =>
      val arr = i + (if (i % 7 == 0) 11L else 0L) - (if (i % 13 == 0) i % 3 else 0L)
      (i, new java.sql.Timestamp(t0 + i * 60000L), arr)
    }
    val df = events.toDF("event_id", "ts", "arrival")
    // brute force over the total (arrival, event_id) order
    val ordered = events.sortBy(e => (e._3, e._1))
    var run = Long.MinValue
    val lates = ordered.map { e =>
      run = math.max(run, e._2.getTime * 1000L)
      (run - e._2.getTime * 1000L) / 1000000L
    }
    val expect = lates.map(l => math.min(l / 60, 5L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val out = Streams.latenessProfile(df, "arrival",
        bucketSeconds = 60, maxBucket = 5, blockSize = 32L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === expect)
  }
}
