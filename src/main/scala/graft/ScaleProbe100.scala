package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** 100x scale probe (r10 verdict item 4): the 10x probe
  * ([[ScaleProbe]]) stops at 6M rows / 50k docs; this one runs ONLY
  * the two worst cost families — dedup pair generation and entity
  * resolution — at 100x (500k docs / 1.56M linkage records), reporting
  * candidate-volume-vs-true-pairs and wall time so BASELINE.md can
  * record whether candidate work grows NEAR-LINEARLY with the corpus.
  *
  * Corpus shape matters for that claim: the 10x probe's all-copies
  * corpus (every doc x10) is the right worst case for verification
  * cost, but scaling IT 10x more would square the per-group pair count
  * (100-cliques) — an intrinsically quadratic duplication profile no
  * pipeline exhibits. Real corpora grow with a roughly CONSTANT
  * duplication rate, so the 100x synthesis keeps the 10x probe's
  * duplication profile (each text in a 10-copy group) and scales the
  * number of DISTINCT texts 10x instead: 10 replicas x 10 "families"
  * of the sf0.1 base, where family g suffixes every token with g —
  * zero shared shingles across families, identical text within a
  * group. True-pair count is then exactly 10x the 10x probe's
  * (5k docs x 10 families x C(10,2) = 2.25M vs 225k), so a
  * near-linear candidate count at 10x the corpus is the pass
  * criterion, and the per-group verify volume is unchanged.
  *
  * Entity resolution widens the round-9b digit-word name scheme to 7
  * words (1.56M ids exceed the 6-digit namespace and would alias) and
  * re-sizes the blocking keys exactly the way the operator's contract
  * says to: forward prefix 30 (5 words = id mod 100000, ~15-row
  * blocks), reverse prefix 36 (6 words = id div 10, ~10-row blocks) —
  * block SIZE, and therefore candidate volume per record, stays
  * constant; only the block COUNT scales with the corpus.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleProbe100"
  * Writes only under /tmp/graft_scale100.
  */
object ScaleProbe100 {

  private val words = Seq("alpha", "bravo", "charl", "delta", "echox",
    "foxtr", "golfx", "hotel", "india", "julie")

  private def nameOf7(c: Column): Column = {
    val arr = array(words.map(lit): _*)
    def digit(p: Long) = ((c / p).cast("long") % 10).cast("int")
    concat_ws("-", (0 until 7).map(i =>
      element_at(arr, digit(math.pow(10, i).toLong) + 1)): _*)
  }

  def main(args: Array[String]): Unit = {
    // optional args = section subset (see `sections` below)
    // so a new family can be probed without re-timing the others; an
    // unknown name must fail loudly, not silently probe nothing
    val sections = Set("dedup", "er", "url", "graph", "knn", "cc")
    require(args.forall(sections), s"unknown section in ${args.toSeq}; " +
      s"valid: ${sections.mkString("|")}")
    def enabled(section: String): Boolean =
      args.isEmpty || args.contains(section)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = "/tmp/graft_scale100"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-probe-100x")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe100] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache()
    }

    // ---- 500k-doc corpus: 10 families x 10 replicas of the 5k base ----
    // Staged on first use by ANY section that reads it (dedup and cc),
    // so each section is independently runnable on a fresh machine.
    def corpus100(): org.apache.spark.sql.DataFrame = {
      if (!Files.exists(Paths.get(s"$out/documents.parquet/_SUCCESS"))) {
        val t0 = System.nanoTime()
        val docs = Tables.load(spark, base, "documents")
        (0 until 10).flatMap { g =>
          (0 until 10).map { r =>
            docs.select(
              (col("doc_id") + lit((g * 10 + r) * 10000000L)).as("doc_id"),
              regexp_replace(col("text"), "(\\S+)", "$1g" + g).as("text"),
              col("lang"), col("source"), col("n_chars"))
          }
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$out/documents.parquet")
        println(f"[probe100] one-off 100x corpus synthesis: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      Tables.load(spark, out, "documents")
    }

    if (enabled("dedup")) locally {
    val docs = corpus100()
    println(s"[probe100] cpus=$cpus docs=${docs.count()}")

    // true pairs from the group structure (exact-text groups)
    val truePairs = docs.groupBy(xxhash64(col("text")))
      .agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2).cast("long"))
      .head().getLong(0)
    // LSH candidate volume = the distinct band-collision pair count
    // (threshold 0 keeps every candidate; est_jaccard >= 0 always)
    val candidates = graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text",
      k = 64, bands = 16, threshold = 0.0).count()
    spark.catalog.clearCache()
    println(s"[probe100] dedup: true pairs=$truePairs lsh candidates=$candidates " +
      f"(candidate/true ratio ${candidates.toDouble / truePairs}%.3f; " +
      "10x probe: 225k true pairs at 50k docs — near-linear = ~10x both)")
    time("minhash LSH pairs (k=64, b=16, threshold 0.35), 500k docs") {
      graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text",
        k = 64, bands = 16, threshold = 0.35).count()
    }
    time("LSH + exact-verified pairs (threshold 0.9), 500k docs") {
      graft.ops.Dedup.lshVerifiedPairs(docs, "doc_id", "text",
        threshold = 0.9).count()
    }
    }

    // ---- entity resolution over 1.56M records ----
    if (enabled("er")) locally {
    val erDir = s"$out/er100"
    if (!Files.exists(Paths.get(s"$erDir/corpus.parquet/_SUCCESS"))) {
      val t0 = System.nanoTime()
      val ids = spark.range(1, 1500001).select(col("id"))
      val named = ids.select(col("id"), nameOf7(col("id")).as("nm"))
      named.unionByName(
        named.filter(col("id") % 25 === 0)
          .select((col("id") + lit(1500001L)).as("id"),
            concat(substring(col("nm"), 1, 40), lit("z")).as("nm")))
        .write.mode("overwrite").parquet(s"$erDir/corpus.parquet")
      println(f"[probe100] one-off 100x name corpus synthesis: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val corpus = spark.read.parquet(s"$erDir/corpus.parquet")
    val erKeys = graft.ops.MasterData.prefixKeys(col("nm"), 30, 36)
    locally {
      val members = graft.ops.MasterData.linkageMembers(corpus, "id", "nm", erKeys)
      val dfs = graft.ops.MasterData.linkageBlockDfs(members)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = dfs.filter(col("_df") <= 64)
        .agg(coalesce(sum(col("_df") * (col("_df") - 1) / 2), lit(0L))
          .cast("long")).head().getLong(0)
      val dropped = dfs.filter(col("_df") > 64)
        .agg(coalesce(sum(col("_df")), lit(0L)).cast("long")).head().getLong(0)
      val n = corpus.count()
      // planted pairs: one tail-edit variant per 25th id
      println(s"[probe100] linkage: corpus=$n candidate pairs=$cand " +
        s"(~${cand / math.max(n, 1)} per record; true pairs=${1500000 / 25}) " +
        s"rows in dropped blocks=$dropped")
      dfs.unpersist()
      spark.catalog.clearCache()
    }
    time("entity resolution over the 100x name corpus (1.56M records)") {
      graft.ops.MasterData.resolveEntities(corpus, "id", "nm",
        prefixLen = 30, maxDist = 1, maxBlockDf = 64, revPrefixLen = 36).count()
    }
    // incremental: stored state built once, the timed op absorbs 1/10
    locally {
      val stored = corpus.filter(col("id") % 10 =!= 0)
      val memDir = s"$erDir/members.parquet"
      if (!Files.exists(Paths.get(s"$memDir/_SUCCESS"))) {
        val t0 = System.nanoTime()
        graft.ops.MasterData.linkageMembers(stored, "id", "nm", erKeys)
          .write.mode("overwrite").parquet(memDir)
        graft.ops.MasterData.linkageBlockDfs(spark.read.parquet(memDir))
          .write.mode("overwrite").parquet(s"$erDir/dfs.parquet")
        graft.ops.MasterData.linkagePairsByKeys(stored, "id", "nm", erKeys,
            maxDist = 1, maxBlockDf = 64)
          .write.mode("overwrite").parquet(s"$erDir/pairs.parquet")
        println(f"[probe100] one-off linkage state build (1.4M stored): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("incremental entity resolution: 156k batch vs 1.4M stored state") {
        graft.ops.MasterData.resolveEntitiesIncrement(corpus, "id",
          spark.read.parquet(memDir),
          spark.read.parquet(s"$erDir/dfs.parquet"),
          spark.read.parquet(s"$erDir/pairs.parquet"),
          corpus.filter(col("id") % 10 === 0), "nm", erKeys,
          maxDist = 1, maxBlockDf = 64).count()
      }
    }
    }

    // ---- round-11 families at 100x ----
    // URL canonicalization + rule matching over 30M generated URLs
    // (15M ids x base+variant, the q_url_canonical shapes): per-row
    // string work rides the scan, the only exchange is the final
    // group-by-canonical — throughput should track row count linearly.
    if (enabled("url")) locally {
      val ids = spark.range(1L, 15000001L, 1L, 64).select(col("id"))
      val hostBase = concat(lit("shop"), (col("id") % 997).cast("string"),
        lit(".example.com"))
      val pathBase = concat(lit("/item/"), col("id").cast("string"))
      val base = concat(lit("https://"), hostBase, pathBase,
        when(col("id") % 3 === 0, lit("?a=1&b=2")).otherwise(lit("")))
      val variant = concat(lit("HTTPS://WWW."), upper(hostBase),
        lit(":443"), pathBase, lit("/?utm_source=mail#frag"))
      val urls = ids.select(explode(array(
          struct((col("id") * 2).as("url_id"), base.as("url")),
          struct((col("id") * 2 + 1).as("url_id"), variant.as("url"))))
          .as("_u"))
        .select(col("_u.url_id").as("url_id"), col("_u.url").as("url"))
      time("URL canonicalization + group-by-canonical, 30M urls") {
        urls.select(graft.ops.Urls.canonical(col("url")).as("c"))
          .groupBy(col("c")).agg(count(lit(1))).count()
      }
      import spark.implicits._
      val rulesDf = (0 until 997).flatMap(h => Seq(
          (s"shop$h.example.com", "/item", h % 2 == 0),
          (s"shop$h.example.com", "/item/1", true)))
        .toDF("host", "prefix", "allow")
      time("robots-rule verdicts (1,994 rules, broadcast), 30M urls") {
        graft.ops.Urls.applyRules(urls, "url", rulesDf)
          .groupBy(col("allowed")).agg(count(lit(1))).count()
      }
    }
    // link prediction over a synthesized 1M-node bounded-degree graph
    // (ring + 3 chord families -> degree 8 for every node, no hubs):
    // wedge volume is exactly sum(deg^2)/2-ish = bounded by maxDeg*|E|,
    // so candidate work scales with EDGES, not nodes^2.
    if (enabled("graph")) locally {
      val n = 1000000L
      val nodes = spark.range(0L, n, 1L, 64).select(col("id"))
      val edges = (Seq(1L, 7919L, 104729L, 999983L)).map { step =>
        nodes.select(col("id").as("raw_a"),
            pmod(col("id") + step, lit(n)).as("raw_b"))
          .select(least(col("raw_a"), col("raw_b")).as("item_a"),
            greatest(col("raw_a"), col("raw_b")).as("item_b"))
      }.reduce(_ unionByName _)
      time("link prediction top-3, 1M nodes / 4M edges (deg 8, no hubs)") {
        graft.ops.Graphs.linkPrediction(edges, maxDeg = 64, k = 3).count()
      }
    }

    // ---- connected components at 100x: the dedup-cluster step ----
    // Two regimes: (a) the REAL shape — the 500k-doc corpus's LSH pair
    // graph (10-cliques, diameter 1: converges in ~2 certified
    // rounds), pairs built OUTSIDE the timer so the probe isolates CC;
    // (b) the ADVERSARIAL shape — a 1M-node ring, ONE component of
    // diameter 500k, where plain min-propagation would need 500k
    // rounds and the pointer-jumping step must close it in ~log2(d)
    // ≈ 20 — the property that makes the loop safe on path-shaped
    // contamination chains at any scale.
    if (enabled("cc")) locally {
      val docs = corpus100() // stages the corpus if dedup didn't run
      val ccPairs = graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text",
          k = 64, bands = 16, threshold = 0.35)
        .select(col("id_a"), col("id_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe100] cc input pairs: ${ccPairs.count()}")
      time("connected components, 500k-node dup-clique graph (2.5M pairs)") {
        graft.ops.Dedup.connectedComponents(ccPairs).count()
      }
      ccPairs.unpersist()
      val n = 1000000L
      val ring = spark.range(0L, n, 1L, 64)
        .select(col("id").as("id_a"), pmod(col("id") + 1L, lit(n)).as("id_b"))
      time("connected components, 1M-node ring (diameter 500k, log-d jumping)") {
        val cc = graft.ops.Dedup.connectedComponents(ring)
        val comps = cc.agg(countDistinct(col("cluster_id"))).head().getLong(0)
        require(comps == 1L, s"ring must be one component, got $comps")
        cc.count()
      }
    }

    // ---- kNN graph / semantic dedup at 100x (r11 verdict item 4) ----
    // 200k 64-dim vectors with PLANTED CLIQUE structure: 20k anchor
    // directions x 10 near-identical replicas (relative perturbation
    // 1e-3 → intra-clique angle ~1e-3 rad, inter-anchor angles
    // effectively random). True near-neighbor pairs = 20k x C(10,2) =
    // 900k — the same constant-duplication-rate profile as the dedup
    // corpus above. nBits is the SCALE KNOB of hyperplane LSH and the
    // probe MEASURES it rather than assuming: random co-bucketing per
    // table is ~C(n/2^nBits, 2)·2^nBits pairs, so holding nBits fixed
    // across a 10x corpus grows random collisions ~100x (the fixed-bits
    // CONTROL row shows exactly that), while growing buckets with the
    // corpus (13 bits at 20k → 16 bits at 200k, constant ~2.4-3
    // vectors/bucket load) holds candidate/true near-constant — the
    // property that carries to a billion vectors. Recall is safe at
    // either setting: a clique pair splits on one hyperplane with
    // P ≈ θ/π ≈ 3e-4, so even 16 bits keeps ~99.5% of true pairs per
    // table and 4 independent tables push recall to ~1.
    if (enabled("knn")) locally {
      val tables = 4
      // hash-derived dims, not sin(g·j): a linear-phase family aliases
      // (anchors at regular id deltas come out near-parallel), which
      // would plant unintended cross-clique near-dups; xxhash64 per
      // (anchor, dim) gives independent uniform dims, so inter-anchor
      // cosines concentrate at N(0, 1/64) and only the cliques are true
      def pr(a: Column, j: Column, seed: Int): Column =
        (xxhash64(a, j, lit(seed)) % 1001L).cast("double") / lit(500.0)
      def vecs(nCliques: Int): org.apache.spark.sql.DataFrame =
        spark.range(0L, nCliques * 10L, 1L, 64)
          .select(col("id"),
            transform(sequence(lit(1), lit(64)), j =>
              pr((col("id") / 10).cast("long"), j, 1)
                + lit(1e-3) * pr(col("id"), j, 2)).as("vec"))
      def candVolume(df: org.apache.spark.sql.DataFrame, nBits: Int): Long = {
        val signed = graft.ops.Similarity.withLshSignatures(
            df, "id", "vec", nBits, tables)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = (0 until tables).map { t =>
          val slim = signed.select(col("id"), col(s"sig$t").as("s"))
          slim.select(col("id").as("src"), col("s"))
            .join(slim.select(col("id").as("dst"), col("s")), Seq("s"))
            .filter(col("src") < col("dst"))
            .select(col("src"), col("dst"))
        }.reduce(_ unionByName _).dropDuplicates("src", "dst").count()
        signed.unpersist(blocking = false)
        n
      }
      Seq((2000, 13, "load-matched small"),
          (20000, 16, "load-matched 10x — near-linear = ratio holds"),
          (20000, 13, "fixed-bits CONTROL — random collisions go ~100x"))
        .foreach { case (nCliques, nBits, note) =>
          val trues = nCliques * 45L
          val cand = candVolume(vecs(nCliques), nBits)
          println(s"[probe100] knn-lsh: cliques=$nCliques vectors=${nCliques * 10} " +
            s"nBits=$nBits true pairs=$trues lsh candidates=$cand " +
            f"(candidate/true ratio ${cand.toDouble / trues}%.3f; $note)")
          spark.catalog.clearCache()
        }
      time(s"kNN graph top-5 (nBits=16, tables=$tables), 200k vectors") {
        graft.ops.Similarity.knnGraphLsh(vecs(20000), "id", "vec",
          k = 5, nBits = 16, tables = tables).count()
      }
      time("semantic dedup (cosine >= 0.95 cliques -> keep one), 200k vectors") {
        val out = graft.ops.Similarity.semanticDedup(vecs(20000), "id", "vec",
          threshold = 0.95, nBits = 16)
        val kept = out.filter(col("keep")).count()
        println(s"[probe100]   kept=$kept of 200000 (planted optimum 20000)")
        kept
      }
    }
    spark.stop()
  }
}
