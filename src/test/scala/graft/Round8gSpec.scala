package graft

import graft.ops.{Dedup, Profile, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 7: leakage-safe split, winnowing fingerprints,
  * line-permutation dedup, k-anonymity.
  */
class Round8gSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- leakageSafeSplit ----

  test("leakageSafeSplit: exact duplicates always share a split") {
    val docs = (0L until 200L).map(i => (i, s"doc body number ${i % 50}"))
      .toDF("id", "text") // every text has 4 copies
    val out = Dedup.leakageSafeSplit(docs, "id", "text", 80)
    val perRep = out.groupBy("rep_id")
      .agg(countDistinct(col("split")).as("k"), count(lit(1)).as("n"))
      .collect()
    assert(perRep.forall(_.getAs[Long]("k") === 1L), "a group straddled the boundary")
    assert(perRep.forall(_.getAs[Long]("n") === 4L))
    assert(out.count() === 200L)
    // both labels actually occur across the 50 groups
    assert(out.select("split").distinct().count() === 2L)
  }

  test("leakageSafeSplit: representative is the group min id") {
    val docs = Seq((7L, "same"), (3L, "same"), (9L, "other")).toDF("id", "text")
    val m = Dedup.leakageSafeSplit(docs, "id", "text", 50)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rep_id")).toMap
    assert(m === Map(7L -> 3L, 3L -> 3L, 9L -> 9L))
  }

  // ---- winnowFingerprints ----

  /** Brute-force winnow model mirroring the documented semantics. */
  private def winnowModel(text: String, k: Int, w: Int): Seq[String] = {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.isEmpty) return Seq.empty
    val nG = math.max(toks.size - (k - 1), 1)
    val grams = (0 until nG).map(i => toks.slice(i, i + k).mkString(" "))
    val h = grams.map(g => md5hex(g).take(16))
    val nW = math.max(h.size - (w - 1), 1)
    (0 until nW).map(i => h.slice(i, i + w).min).distinct.sorted
  }

  test("winnowFingerprints matches the brute-force model") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "one two three",          // fewer grams than the window
      "tiny",                    // fewer tokens than k
      "a b c d e f g h i j k l m n o p q r s t",
      "dup dup dup dup dup dup dup dup")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.winnowFingerprints(col("text"), 3, 4).as("fps"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === winnowModel(t, 3, 4), s"text #$i")
    }
  }

  test("winnowFingerprints: guaranteed match on shared >= w+k-1 token runs") {
    // two docs share a 10-token run (w+k-1 = 6 suffices) in different
    // positions — winnowing must select at least one common fingerprint
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, s"prefix words here $shared trailing bits"),
      (2L, s"$shared completely different ending material over here")
    ).toDF("id", "text")
    val fps = df.select(col("id"),
        TextAnalysis.winnowFingerprints(col("text"), 3, 4).as("fps"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[String](1).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty)
  }

  test("winnowFingerprints: empty and whitespace text yield no fingerprints") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
    val out = df.select(
        TextAnalysis.winnowFingerprints(col("text")).as("fps"))
      .collect()
    assert(out.forall(_.getSeq[String](0).isEmpty))
  }

  // ---- permutationInvariantGroups ----

  test("permutationInvariantGroups: line reordering collapses, edits do not") {
    val df = Seq(
      (1L, "line one\nline two\nline three"),
      (2L, "line three\nline one\nline two"),   // permuted -> same group
      (3L, "line one\nline two\nline CHANGED"), // edited  -> own group
      (4L, "  line two  \nline one\n\nline three") // whitespace/blank-line noise
    ).toDF("id", "text")
    val out = Dedup.permutationInvariantGroups(df, "id", "text")
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out === Map(1L -> 3L, 3L -> 1L))
  }

  test("winnowFingerprints: per-row expression, zero shuffle in the plan") {
    val df = Seq((1L, "a b c d e f g")).toDF("id", "text")
    val plan = df.select(TextAnalysis.winnowFingerprints(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---- kAnonymityClasses ----

  test("kAnonymityClasses: small classes suppress into '*', big ones survive") {
    // segment A×nation 1: 12 rows; A×2: 3 rows; B×1: 2 rows -> residual 5
    val rows =
      (0 until 12).map(i => ("A", 1, i % 3)) ++
      (0 until 3).map(i => ("A", 2, i)) ++
      (0 until 2).map(i => ("B", 1, 9))
    val df = rows.toDF("seg", "nat", "s")
    val out = Profile.kAnonymityClasses(df, Seq("seg", "nat"), "s", k = 5)
      .collect().map(r => (r.getAs[String]("seg"), r.getAs[String]("nat")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("l_diversity"),
          r.getAs[Boolean]("suppressed"))).toMap
    assert(out(("A", "1")) === ((12L, 3L, false)))
    assert(out(("*", "*")) === ((5L, 4L, true))) // sensitive {0,1,2,9}
    assert(out.size === 2)
    // every published non-residual class meets k
    assert(out.filterNot(_._2._3).forall(_._2._1 >= 5L))
  }

  test("kAnonymityClasses: class table joins back via broadcast") {
    val df = (0 until 100).map(i => ("s" + (i % 3), i % 7, i)).toDF("a", "b", "s")
    val plan = Profile.kAnonymityClasses(df, Seq("a", "b"), "s", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
  }

  // ---- winnowMatchPairs ----

  test("winnowMatchPairs: shared passage found, disjoint docs are not paired") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron"
    val df = Seq(
      (1L, s"intro words $passage closing remarks"),
      (2L, s"$passage totally different tail content here"),
      (3L, "unrelated content about entirely other things going on here"),
      (4L, "more disjoint vocabulary nothing shared with anyone at all")
    ).toDF("id", "text")
    val pairs = Dedup.winnowMatchPairs(df, "id", "text", minShared = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("winnowMatchPairs: stop-fingerprint cap drops universal boilerplate") {
    // every doc shares the same long boilerplate run; with maxFpDf below
    // the doc count the boilerplate fingerprints are dropped and no
    // pair survives
    val boiler = "standard footer text appended to every single document " +
      "for legal reasons and nothing else"
    val df = (0L until 10L).map(i => (i, s"unique$i token$i $boiler"))
      .toDF("id", "text")
    val pairs = Dedup.winnowMatchPairs(df, "id", "text",
      minShared = 1, maxFpDf = 5)
    assert(pairs.count() === 0L)
  }

  // ---- dedupClusterPlan ----

  test("dedupClusterPlan: cluster-coherent split, longest member kept") {
    // cluster {1,2,3}: near-identical long docs with different lengths;
    // 4 is a singleton
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, base),
      (2L, s"$base extra"),
      (3L, s"$base extra more tokens here"), // longest -> keep winner
      (4L, "completely separate island of text with its own words only")
    ).toDF("id", "text")
    val out = Dedup.dedupClusterPlan(df, "id", "text", trainPct = 50,
        threshold = 0.2, maxShingleDf = 100)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rep_id"), r.getAs[String]("split"),
          r.getAs[Long]("keep_id"), r.getAs[Boolean]("is_kept")))).toMap
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L && out(3L)._1 === 1L)
    assert(out(4L)._1 === 4L)
    // one split label across the whole cluster
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size === 1)
    // quality keep rule: longest member wins the cluster
    assert(out(1L)._3 === 3L && !out(1L)._4 && out(3L)._4)
    // singleton keeps itself
    assert(out(4L)._3 === 4L && out(4L)._4)
  }

  // ---- quotaSample ----

  test("quotaSample: exact quota per stratum, deterministic membership") {
    val df = (0L until 100L).map(i => (i, "s" + (i % 4))).toDF("id", "src")
    val out = Sampling.quotaSample(df, "id", "src", quota = 7)
    val sizes = out.groupBy("src").count().collect()
      .map(r => r.getAs[String]("src") -> r.getAs[Long]("count")).toMap
    assert(sizes.values.toSet === Set(7L))
    // under-full stratum keeps everything
    val small = Sampling.quotaSample(df.filter(col("id") < 10), "id", "src", 7)
    assert(small.count() === 10L)
    // same input -> same picks
    val again = Sampling.quotaSample(df, "id", "src", quota = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === out.select("id").collect().map(_.getLong(0)).toSet)
    // r9 regression (ADVICE r8): an input column named "rk" must
    // survive instead of being silently overwritten by the rank
    val withRk = df.withColumn("rk", lit(99))
    val kept = Sampling.quotaSample(withRk, "id", "src", quota = 7)
    assert(kept.columns.count(_ == "rk") === 1)
    assert(kept.select("rk").distinct().collect().map(_.getInt(0)).toSeq === Seq(99))
  }
}
