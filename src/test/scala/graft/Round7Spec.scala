package graft

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 pack: exact substring duplication (char-k-gram sampling),
  * the BPE merge-step pair counts, and the cross-source shingle
  * overlap matrix.
  */
class Round7Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ---- substringDupStats ----

  test("substringDupStats: exact copy pair reports dup_frac 1.0, unique doc 0.0") {
    import spark.implicits._
    val long = ("alpha beta gamma delta " * 6).trim // 137 chars, well past k
    val other = ("zeta eta theta iota kappa " * 6).trim
    val df = Seq((1L, long), (2L, long), (3L, other)).toDF("id", "text")
    val out = Dedup.substringDupStats(df, "id", "text", k = 40, stride = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L)._1 > 0)
    assert(out(1L) === out(2L))
    assert(out(1L)._3 === 1.0) // every sampled gram occurs twice
    assert(out(3L)._2 === 0L)
    assert(out(3L)._3 === 0.0)
  }

  test("substringDupStats: doc shorter than k contributes zero grams") {
    import spark.implicits._
    val df = Seq((1L, "short text"), (2L, "also short")).toDF("id", "text")
    val out = Dedup.substringDupStats(df, "id", "text", k = 40, stride = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L))
  }

  test("substringDupStats: within-document repetition counts as duplication") {
    import spark.implicits._
    // one doc whose text is the same 50-char run twice: the run's
    // k-grams occur at two corpus positions -> duplicated
    val run = "abcdefghij" * 5
    val df = Seq((1L, run + run)).toDF("id", "text")
    val out = Dedup.substringDupStats(df, "id", "text", k = 40, stride = 10)
      .collect().head
    assert(out.getLong(2) > 0) // n_dup
  }

  test("substringDupStats: stride samples the expected position count") {
    import spark.implicits._
    // len 100, k 40, stride 10 -> positions 0,10,...,60 -> 7 grams
    val txt = "x" * 100
    val df = Seq((1L, txt)).toDF("id", "text")
    val n = Dedup.substringDupStats(df, "id", "text", k = 40, stride = 10)
      .collect().head.getLong(1)
    assert(n === 7L)
  }

  // ---- bpePairStep ----

  test("bpePairStep: pair counts weighted by word frequency") {
    import spark.implicits._
    // "abab" x3 and "ab" x2: pairs of abab = ab,ba,ab; of ab = ab
    // ab: 3*2 + 2*1 = 8; ba: 3*1 = 3
    val df = Seq("abab abab ab", "abab ab").toDF("text")
    val out = TextAnalysis.bpePairStep(df, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("ab" -> 8L, "ba" -> 3L))
  }

  test("bpePairStep: single-char words contribute nothing; topK truncates deterministically") {
    import spark.implicits._
    val df = Seq("a b c xy xz").toDF("text")
    val out = TextAnalysis.bpePairStep(df, "text", topK = 1).collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "xy") // xy/xz tie on count 1 -> pair asc
    assert(out.head.getLong(1) === 1L)
  }

  test("bpePairStep: plan collapses corpus to vocabulary before pair extraction") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val df = TextAnalysis.bpePairStep(docs, "text", topK = 50)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // top-k must be a TakeOrdered (no global Sort+CollectLimit), and the
    // word-count aggregate must sit BELOW the pair-explode generator —
    // in formatted-explain text, deeper operators print after their
    // parents, so an aggregate must appear in the text following the
    // first Generate (exploding pairs over the raw corpus instead of
    // the word-count frame is the scale-killer this pins)
    assert(plan.contains("TakeOrderedAndProject"))
    val gen = plan.indexOf("Generate")
    assert(gen >= 0 && plan.substring(gen).contains("HashAggregate"))
  }

  // ---- curation pipeline composition ----

  test("curation pipeline: sampler rates derive from POST-filter source counts") {
    import spark.implicits._
    // source "a": 100 clean docs; source "b": 4 clean + 200 junk (all
    // dropped by the quality filter). If the sampler saw PRE-filter
    // counts, b (204 docs) would get a sub-1 rate; with post-filter
    // counts b's quota exceeds its 4 survivors (same arithmetic as the
    // temperatureSample spec) so ALL 4 must survive sampling.
    val clean = "the quick brown fox jumps over the lazy dog again and again today"
    val df = ((0 until 100).map(i => (i.toLong, clean, "a")) ++
      (100 until 104).map(i => (i.toLong, clean, "b")) ++
      (200 until 400).map(i => (i.toLong, "tiny doc", "b")))
      .toDF("id", "text", "src")
    val audited = graft.ops.TextAnalysis.qualityFilterReasons(df, "text")
    val kept = audited.filter(col("keep")).select(col("id"), col("src"))
    val sampled = graft.ops.Sampling.temperatureSample(kept, "id", "src",
      alpha = 0.5, targetFraction = 0.3)
    val bySrc = sampled.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("b") === 4L) // post-filter rate >= 1 keeps every survivor
    assert(bySrc("a") > 10L && bySrc("a") < 45L)
  }

  // ---- semanticDedup ----

  test("semanticDedup: clusters keep their minimum; singletons keep themselves") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val base = (0L until 30L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    // a 3-node cluster: two exact copies of vector 5
    val df = (base ++ Seq((100L, base(5)._2), (101L, base(5)._2))).toDF("id", "v")
    val out = graft.ops.Similarity.semanticDedup(df, "id", "v",
      threshold = 0.95, nBits = 8, dims = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(5L) === ((5L, true)))
    assert(out(100L) === ((5L, false)))
    assert(out(101L) === ((5L, false)))
    // everything else is a singleton cluster of itself
    assert(out.filterNot(k => Set(100L, 101L)(k._1)).forall { case (id, (c, keep)) => c == id && keep })
  }

  // ---- qualityFilterReasons ----

  test("qualityFilterReasons: each junk class trips exactly its rule; clean doc keeps") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "tiny doc"),
      (3L, "!!! ??? *** %%% ((( ))) ;;; ::: === +++"),
      (4L, ("spark " * 30).trim)).toDF("id", "text")
    val out = graft.ops.TextAnalysis.qualityFilterReasons(df, "text")
      .select("id", "too_short", "too_long", "high_punct", "repetitious", "keep")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out(1L) === ((false, false, false, false, true)))
    assert(out(2L) === ((true, false, false, false, false)))
    assert(out(3L) === ((false, false, true, false, false)))
    assert(out(4L) === ((false, false, false, true, false)))
  }

  test("qualityFilterReasons: NULL text degrades to the empty-doc path, never NULL booleans") {
    // r7 advice: a NULL-text row must not carry NULL reason booleans —
    // it would count in n_docs but vanish from every sum(reason),
    // silently desyncing the audit from its oracle
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, "")).toDF("id", "text")
    val rows = graft.ops.TextAnalysis.qualityFilterReasons(df, "text")
      .select("id", "too_short", "too_long", "high_punct", "repetitious", "keep")
      .collect()
    rows.foreach { r =>
      (1 to 5).foreach(i => assert(!r.isNullAt(i), s"col $i NULL for id ${r.getLong(0)}"))
      assert(r.getBoolean(1) && !r.getBoolean(5)) // too_short, dropped
    }
  }

  test("qualityFilterReasons: per-row only — no shuffle in the plan") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = graft.ops.TextAnalysis.qualityFilterReasons(docs, "text")
    out.collect()
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"))
  }

  // ---- temperatureSample ----

  test("temperatureSample: rare source keeps everything when its quota exceeds its size") {
    import spark.implicits._
    // sources sized 100 and 4, alpha 0.5, target 0.3:
    // weights 10 and 2; rate_small = (2/12)*104*0.3/4 = 1.3 -> capped,
    // every small-source row survives; rate_big = (10/12)*104*0.3/100 = 0.26
    val df = ((0 until 100).map(i => (i.toLong, "big")) ++
      (100 until 104).map(i => (i.toLong, "small"))).toDF("id", "src")
    val out = graft.ops.Sampling.temperatureSample(df, "id", "src",
      alpha = 0.5, targetFraction = 0.3)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("small") === 4L)
    assert(bySrc("big") > 10L && bySrc("big") < 45L) // ~26 expected
  }

  test("temperatureSample: alpha=1 is uniform downsampling at targetFraction") {
    import spark.implicits._
    val df = ((0 until 200).map(i => (i.toLong, "a")) ++
      (200 until 600).map(i => (i.toLong, "b"))).toDF("id", "src")
    val out = graft.ops.Sampling.temperatureSample(df, "id", "src",
      alpha = 1.0, targetFraction = 0.5)
    // every source's rate is exactly 0.5; the md5 16-bit cut keeps
    // close to half of each (binomial tolerance)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(bySrc("a") - 100.0) < 30)
    assert(math.abs(bySrc("b") - 200.0) < 45)
    // determinism: a second run keeps the identical id set
    val again = graft.ops.Sampling.temperatureSample(df, "id", "src",
      alpha = 1.0, targetFraction = 0.5)
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("temperatureSample: corpus meets rates through a broadcast join (no fact shuffle)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = graft.ops.Sampling.temperatureSample(docs, "doc_id", "source",
      alpha = 0.5, targetFraction = 0.3)
    out.collect()
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  // ---- knnGraphLsh ----

  test("knnGraphLsh: exact-copy vector is its twin's rank-1 neighbor at cos ~1") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val copies = base.filter(_._1 % 4 == 0).map { case (i, v) => (i + 100L, v) }
    val df = (base ++ copies).toDF("id", "v")
    val g = graft.ops.Similarity.knnGraphLsh(df, "id", "v",
      k = 3, nBits = 6, tables = 4, dims = 8)
    val top1 = g.filter(col("src") >= 100L && col("rank") === 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(top1.keySet === copies.map(_._1).toSet) // every copy has edges
    top1.foreach { case (src, (dst, cos)) =>
      assert(dst === src - 100L)
      assert(math.abs(cos - 1.0) < 1e-9)
    }
  }

  test("knnGraphLsh: no self edges, ranks within k, pairs deduped across tables") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0L until 30L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("id", "v")
    val g = graft.ops.Similarity.knnGraphLsh(df, "id", "v",
      k = 2, nBits = 4, tables = 3, dims = 8).collect()
    assert(g.forall(r => r.getLong(0) != r.getLong(1)))
    assert(g.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 2))
    val pairs = g.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length === pairs.length)
  }

  test("knnGraphLsh: per-node top-k compiles to WindowGroupLimit") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = (0L until 30L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("id", "v")
    val g = graft.ops.Similarity.knnGraphLsh(df, "id", "v",
      k = 2, nBits = 4, tables = 2, dims = 8)
    g.collect()
    val plan = g.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("WindowGroupLimit"))
  }

  // ---- knnGraphIncrement ----

  test("knnGraphIncrement: batch copies find their stored originals; within-batch edges exist") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val stored = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    // batch: copies of vectors 0 and 4, plus an exact within-batch dup pair
    val shared = Array.fill(8)(rnd.nextGaussian().toFloat)
    val batch = Seq((100L, stored(0)._2), (104L, stored(4)._2),
      (110L, shared), (111L, shared))
    val sig = (df: org.apache.spark.sql.DataFrame) =>
      graft.ops.Similarity.withLshSignatures(df, "id", "v", nBits = 6, tables = 4, dims = 8)
    val g = graft.ops.Similarity.knnGraphIncrement(
      sig(batch.toDF("id", "v")), sig(stored.toDF("id", "v")), k = 3)
    val top1 = g.filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1(100L) === 0L)
    assert(top1(104L) === 4L)
    assert(top1(110L) === 111L) // within-batch duplicate found
    assert(top1(111L) === 110L)
    // only batch ids appear as src
    assert(g.select("src").collect().forall(_.getLong(0) >= 100L))
  }

  test("knnGraphLsh: recall climbs with table count on the hardest (uniform) corpus") {
    import spark.implicits._
    // uniformly random vectors are LSH's worst case (no angular
    // clustering to exploit), so this pins the documented recall knob
    // rather than a planted certainty: more tables → monotonically
    // more of the true top-3 edges. Fixed seed → deterministic
    // (measured 0.04 / 0.31 / 0.72 at tables 1/4/12).
    val rnd = new scala.util.Random(29)
    val vecs = (0L until 60L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "v")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val truth = vecs.flatMap { case (i, vi) =>
      vecs.filter(_._1 != i).map { case (j, vj) => (j, cos(vi, vj)) }
        .sortBy { case (j, c) => (-c, j) }.take(3).map(p => (i, p._1))
    }.toSet
    val recalls = Seq(1, 4, 12).map { t =>
      val g = graft.ops.Similarity.knnGraphLsh(df, "id", "v",
        k = 3, nBits = 6, tables = t, dims = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (g & truth).size.toDouble / truth.size
    }
    assert(recalls(0) < recalls(1) && recalls(1) < recalls(2))
    assert(recalls(2) >= 0.6)
  }

  test("knnGraphIncrement: mismatched signature frames fail loudly") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(8)(0.5f))).toDF("id", "v")
    val a = graft.ops.Similarity.withLshSignatures(df, "id", "v", nBits = 6, tables = 4, dims = 8)
    val b = graft.ops.Similarity.withLshSignatures(df, "id", "v", nBits = 6, tables = 2, dims = 8)
    assertThrows[IllegalArgumentException] {
      graft.ops.Similarity.knnGraphIncrement(a, b, k = 3)
    }
  }

  // ---- sourceOverlapMatrix ----

  test("sourceOverlapMatrix: hand-computed Jaccard between two sources") {
    import spark.implicits._
    // srcA docs produce distinct 2-gram shingle sets {a b, b c} and
    // {b c, c d}; union = {a b, b c, c d} (3). srcB: {b c, c d} (2).
    // inter = 2, jaccard = 2 / (3 + 2 - 2) = 0.666667
    val df = Seq(
      ("A", "a b c"), ("A", "b c d"),
      ("B", "b c d")).toDF("source", "text")
    val out = Dedup.sourceOverlapMatrix(df, "source", "text", n = 2)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) === (("A", "B")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((3L, 2L, 2L)))
    assert(r.getDouble(5) === 0.666667)
  }

  test("sourceOverlapMatrix: disjoint sources produce no pair row") {
    import spark.implicits._
    val df = Seq(("A", "a b c"), ("B", "x y z")).toDF("source", "text")
    assert(Dedup.sourceOverlapMatrix(df, "source", "text", n = 2).count() === 0L)
  }

  test("empty/whitespace docs contribute no shingles to overlap or verified pairs") {
    // r7 advice: the empty-token convention must be ONE convention —
    // a doc with zero non-empty tokens has NO shingles (tokenHashes
    // filters '' before shingling), so an empty doc shared by two
    // sources must not create an intersection row, and two empty docs
    // must not become a J=1.0 verified pair. Both oracles now filter
    // LENGTH(x) > 0 to match.
    import spark.implicits._
    val overlap = Dedup.sourceOverlapMatrix(
      Seq(("A", ""), ("B", "   "), ("A", "a b c"), ("B", "x y z"))
        .toDF("source", "text"), "source", "text", n = 2)
    assert(overlap.count() === 0L)
    val pairs = Dedup.lshVerifiedPairs(
      Seq((1L, ""), (2L, "  "), (3L, "p q r s t u v w"), (4L, "p q r s t u v w"))
        .toDF("id", "text"), "id", "text", threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((3L, 4L)), s"got $pairs")
  }
}
