package graft

import graft.ops.{Dedup, Packing, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operators: substring-duplication removal, materialized
  * packed sequences, iterated BPE training, embedding k-means.
  */
class Round8Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- substringDedup ----

  test("substringDedup: an exact copy with >= k tokens is cut to nothing, the original kept") {
    val text = "a b c d e f g h i j k l" // 12 tokens, k = 10
    val df = Seq((1L, text), (2L, text)).toDF("id", "text")
    val out = Dedup.substringDedup(df, "id", "text", k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((12L, 12L, text)))
    // doc 2's grams at p=0,1,2 are all non-first occurrences; their
    // windows [0,9],[1,10],[2,11] cover every position
    assert(out(2L) === ((12L, 0L, "")))
  }

  test("substringDedup: an intra-document repeated span loses its second occurrence") {
    val run = "p q r s t u v w x y" // 10 tokens
    val df = Seq((1L, s"$run mid $run")).toDF("id", "text")
    val out = Dedup.substringDedup(df, "id", "text", k = 10).collect().head
    // gram at p=11 equals gram at p=0 → remove [11,20]; boundary grams
    // p=1..10 are unique and cut nothing
    assert(out.getLong(1) === 21L)
    assert(out.getLong(2) === 11L)
    assert(out.getString(3) === s"$run mid")
  }

  test("substringDedup: sub-k docs are never cut; empty docs survive as empty") {
    val df = Seq(
      (1L, "tiny duplicated doc"), (2L, "tiny duplicated doc"),
      (3L, ""), (4L, "   ")).toDF("id", "text")
    val out = Dedup.substringDedup(df, "id", "text", k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((3L, 3L, "tiny duplicated doc")))
    assert(out(2L) === ((3L, 3L, "tiny duplicated doc"))) // exact dedup's job, not this cut's
    assert(out(3L) === ((0L, 0L, "")))
    assert(out(4L) === ((0L, 0L, "")))
  }

  // ---- emitPackedSequences ----

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("emitPackedSequences: boundary-straddling docs land in both sequences, content pinned by md5") {
    val df = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g")).toDF("id", "text")
    val out = Packing.emitPackedSequences(df, "id", "text", seqTokens = 4)
      .orderBy("seq_id").collect()
    assert(out.length === 2)
    // seq 0 = [a b c d]: doc 2 straddles the boundary
    assert(out(0).getLong(0) === 0L && out(0).getLong(1) === 4L)
    assert(out(0).getLong(2) === 2L && out(0).getLong(3) === 1L && out(0).getLong(4) === 2L)
    assert(out(0).getString(5) === md5Hex("a b c d"))
    // seq 1 = [e f g]: the final partial sequence
    assert(out(1).getLong(0) === 1L && out(1).getLong(1) === 3L)
    assert(out(1).getLong(2) === 2L && out(1).getLong(3) === 2L && out(1).getLong(4) === 3L)
    assert(out(1).getString(5) === md5Hex("e f g"))
  }

  test("emitPackedSequences agrees with packSequences on the corpus: full seqs + contiguous ids") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emit = Packing.emitPackedSequences(docs, "doc_id", "text", seqTokens = 64)
      .orderBy("seq_id").collect()
    val ids = emit.map(_.getLong(0))
    assert(ids.sameElements(ids.indices.map(_.toLong)), "seq_ids must be contiguous from 0")
    // every sequence is exactly seqTokens long except the final partial
    assert(emit.dropRight(1).forall(_.getLong(1) === 64L))
    assert(emit.last.getLong(1) <= 64L)
    // total packed tokens == the offset frame's token total
    val total = Packing.packSequences(docs, "doc_id", "text", seqTokens = 64)
      .agg(sum("n_tokens")).collect().head.getLong(0)
    assert(emit.map(_.getLong(1)).sum === total)
  }

  // ---- bpeTrain ----

  test("bpeTrain: deterministic merge sequence with greedy overlap and tie-breaks") {
    // words: aaa x1, low x3 ("x" is sub-length and ignored)
    val df = Seq((1L, "aaa low low x"), (2L, "low")).toDF("id", "text")
    val out = TextAnalysis.bpeTrain(df, "text", iterations = 4)
      .orderBy("iter").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) === ((1L, "l", "o", 3L)))  // ties (l,o)=(o,w)=3 → lhs text wins
    assert(out(1) === ((2L, "lo", "w", 3L)))
    assert(out(2) === ((3L, "a", "a", 2L)))  // aaa has TWO overlapping (a,a) pairs
    assert(out(3) === ((4L, "aa", "a", 1L))) // greedy cut aaa -> <aa><a>, not <a><aa>
  }

  test("packedDocSpans: per-sequence doc spans, straddler split across sequences") {
    val df = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g")).toDF("id", "text")
    val out = Packing.packedDocSpans(df, "id", "text", seqTokens = 4)
      .orderBy("seq_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      (0L, 1L, 0L, 3L), (0L, 2L, 3L, 1L),  // doc 2: 1 token in seq 0...
      (1L, 2L, 0L, 2L), (1L, 3L, 2L, 1L))) // ...and 2 in seq 1
  }

  test("lengthBuckets: power-of-two buckets, padding waste, truncation at maxSeq") {
    val texts = Seq(1, 2, 3, 5, 300).map(n => Seq.fill(n)("t").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = Packing.lengthBuckets(df, "id", "text", maxSeq = 256)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === Array(
      (1L, 1L, 1L, 0L, 0L),
      (2L, 1L, 2L, 0L, 0L),
      (4L, 1L, 3L, 1L, 0L),
      (8L, 1L, 5L, 3L, 0L),
      (256L, 1L, 256L, 0L, 44L))) // 300 tokens clamp to 256, 44 truncated
  }

  test("bpeEncodeStats: trained merges compress per-source counts as hand-computed") {
    // 2 iterations over {low x3, aaa x1}: merges (l,o) then (lo,w) →
    // low = 1 symbol, aaa = 3 symbols; "x" is sub-length and excluded
    val df = Seq(("a", "low low aaa x"), ("b", "low")).toDF("source", "text")
    val out = TextAnalysis.bpeEncodeStats(df, "text", "source", iterations = 2)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) === (("a", 3L, 5L, math.rint(5.0 / 3.0 * 1e6) / 1e6)))
    assert(out(1) === (("b", 1L, 1L, 1.0)))
  }

  test("normalizeText: NFC composes, invisibles strip, whitespace collapses, null degrades") {
    val df = Seq(
      (1L, "  Café du​ monde \t x  "),
      (2L, "already clean"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "Café du monde x") // composed single codepoint
    assert(out(2L) === "already clean")
    assert(out(3L) === "")
    // the NFC step is a native expression, not a UDF — the projection
    // must stay inside whole-stage codegen
    val plan = df.select(TextAnalysis.normalizeText(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  // ---- clusterEmbeddings ----

  private def plantedVec(id: Long, k: Int, dims: Int): Array[Double] = {
    val v = Array.fill(dims)(0.0)
    v((id % k).toInt) = 1.0
    v((k + id % k).toInt) = (id % 5 + 1) / 1024.0
    v
  }

  test("clusterEmbeddings with explicit init: planted groups assign analytically") {
    val k = 4
    val df = (0L until 40L).map(i => (i, plantedVec(i, k, 16).toSeq))
      .toDF("id", "v")
    val init = (0 until k).map(g =>
      Array.tabulate(16)(d => if (d == g) 1.0 else 0.0)).toArray
    val out = Similarity.clusterEmbeddings(df, "id", "v", k,
        lloydIters = 2, init = Some(init))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.length === 40)
    assert(out.forall { case (id, cid, _) => cid === (id % k).toInt })
    assert(out.forall(_._3 > 0.999)) // tight cones: members hug their centroid
  }

  test("clusterEmbeddings hash-seeded: total assignment, valid cids, deterministic") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    def run() = Similarity.clusterEmbeddings(emb, "id", "v", nClusters = 8)
      .orderBy("id").collect().map(r => (r.get(0), r.getInt(1), r.getDouble(2)))
    val a = run()
    assert(a.length === emb.count())
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    assert(a.map(_._2).distinct.length > 1, "degenerate single-cluster outcome")
    assert(a.sameElements(run()), "fixed seeds must make reruns identical")
  }

  test("clusterPrune: top-m per cluster with id tie-break; per-key limit pushed into the window") {
    val k = 4
    val df = (0L until 40L).map(i => (i, plantedVec(i, k, 16).toSeq))
      .toDF("id", "v")
    val init = (0 until k).map(g =>
      Array.tabulate(16)(d => if (d == g) 1.0 else 0.0)).toArray
    val out = Similarity.clusterPrune(df, "id", "v", k, keepPerCluster = 3,
      lloydIters = 2, init = Some(init))
    val rows = out.collect()
    assert(rows.length === k * 3)
    assert(rows.groupBy(_.getInt(1)).forall(_._2.length === 3))
    // identical-jitter members tie on cos; rank must break by id
    val perCid = rows.groupBy(_.getInt(1)).view.mapValues(
      _.sortBy(_.getInt(3)).map(_.getLong(0)).toSeq).toMap
    perCid.values.foreach { ids =>
      val ties = ids.groupBy(_ % 5) // same id%5 → same jitter → same cos
      ties.values.foreach(t => assert(t == t.sorted))
    }
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "per-cluster top-k must compile to WindowGroupLimit, not a full rank")
  }

  test("tokenBudgetPlan: integer targets, downsample and multi-epoch regimes, deficit") {
    // source a: 10 tokens, weight 1; source bb: 2 tokens, weight 3
    val df = Seq(
      ("a", Seq.fill(10)("t").mkString(" ")),
      ("bb", "t t")).toDF("source", "text")
    val out = Sampling.tokenBudgetPlan(df, "source", "text",
        weightExpr = length(col("source")).cast("long"),
        budgetTokens = 40L, maxEpochs = 4.0)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
    // W = 3; a: target 40*1/3 = 13 → rate 1.0? no: 13 > 10 avail → rate 1, epochs 1.3
    assert(out(0) === (("a", 1L, 10L, 1L, 13L, 1.0, 1.3, 0L)))
    // bb: target 40*2/3 = 26, avail 2 → rate 1, epochs capped 4.0, deficit 26-8=18
    assert(out(1) === (("bb", 1L, 2L, 2L, 26L, 1.0, 4.0, 18L)))
  }

  test("substringDedup: dup detection is a map-combinable aggregate, not a window") {
    // a viral boilerplate gram at 100 TB must not funnel its whole
    // occurrence list through one window task
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"), col("text"))
    val out = Dedup.substringDedup(docs, "id", "text", k = 10)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "expected no window operator in the plan")
  }
}
