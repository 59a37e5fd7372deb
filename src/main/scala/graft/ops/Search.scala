package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text relevance search over a document corpus: an explicit
  * inverted index (postings list) plus a deterministic BM25-style
  * ranker on top of it.
  *
  * The reference engine has no text-search surface; this is part of the
  * beyond-reference training-pipeline layer (SURVEY §2.11): a corpus
  * catalog at 100 TB needs "find the documents about X" as a first-
  * class operator, and the scalable shape is index-once / search-many —
  * the postings frame is built in one shuffle, persisted (or written
  * bucketed by term), and every query afterwards touches only the
  * postings of its own terms (a pushed-down `term IN (...)` filter that
  * prunes to a few million rows no matter how big the corpus is).
  *
  * Determinism note (the whole file follows the repo's oracle
  * discipline): scoring uses only IEEE-exact double ops (divide,
  * multiply, add) evaluated in a FIXED fold order over the query terms
  * — per-doc term frequencies are aggregated as exact integers first,
  * then combined in one projection, so there is no floating-point
  * aggregation across an unordered shuffle anywhere. The classic BM25
  * log-idf is replaced by the rational idf N/df (log is monotone in it,
  * so single-term ranking is identical and multi-term ranking is the
  * same family up to idf weighting) because `ln` is not correctly
  * rounded and would differ across engines in the last ulp.
  */
object Search {

  /** Postings list: one row per (term, doc) with the term frequency.
    * One wide shuffle on (term, doc_id) with map-side partial
    * aggregation; at 100 TB this is the index-build job you run once
    * and write out partitioned/bucketed by `term`.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Per-term saturated-tf × rational-idf contribution, built from
    * exact-integer tf/df/N so the double arithmetic is a fixed op
    * sequence: (tf/(tf+k1)) * (N/df).
    */
  private def contribution(tf: Column, df: Column, n: Column, k1: Double): Column =
    when(tf > 0 && df > 0,
      (tf.cast("double") / (tf.cast("double") + lit(k1))) *
        (n.cast("double") / df.cast("double")))
      .otherwise(lit(0.0))

  /** Top-k relevance search over a prebuilt postings frame.
    *
    * Plan shape: filter postings to the query terms (pushed to the
    * scan), pivot the ≤|terms| surviving rows per doc into integer tf
    * columns (one small shuffle keyed by doc_id), broadcast the one-row
    * df frame, score in a single projection with a fixed left-to-right
    * fold over the term order, and take the global top-k
    * (TakeOrderedAndProject — no full sort). Nothing in the plan scales
    * with corpus size except the pruned postings scan.
    *
    * @param nDocs corpus size as a 1-row/1-col frame (cross-joined in
    *              plan, so no driver-side action is forced here)
    */
  def searchIndex(postings: DataFrame, terms: Seq[String], k: Int,
                  nDocs: DataFrame, k1: Double = 1.5): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "query terms must be non-empty and distinct")
    val hit = postings.filter(col("term").isin(terms: _*))
    // one row: df per term (document frequency), exact integers
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, lit(1L)).otherwise(lit(0L))).as(s"df_$i")
    }
    val dfRow = hit.groupBy().agg(dfAggs.head, dfAggs.tail: _*)
    // per doc: tf per term, exact integers
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("tf")).otherwise(lit(0L))).as(s"tf_$i")
    }
    val tfs = hit.groupBy("doc_id").agg(tfAggs.head, tfAggs.tail: _*)
    val n = nDocs.select(col(nDocs.columns.head).cast("long").as("n_corpus"))
    val scored = tfs.crossJoin(broadcast(dfRow)).crossJoin(broadcast(n))
    val score = terms.indices.foldLeft(lit(0.0)) { (acc, i) =>
      acc + contribution(col(s"tf_$i"), col(s"df_$i"), col("n_corpus"), k1)
    }
    val nHit = terms.indices.foldLeft(lit(0L)) { (acc, i) =>
      acc + when(col(s"tf_$i") > 0, lit(1L)).otherwise(lit(0L))
    }
    scored.select(col("doc_id"), nHit.as("n_hit"), score.as("score_raw"))
      .orderBy(col("score_raw").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_hit"),
        round(col("score_raw"), 6).as("score"))
  }

  /** Positional postings: one row per (term, doc, position), 0-based.
    * The index shape phrase and proximity queries need; same one-
    * shuffle build cost as [[invertedIndex]] plus the position column.
    */
  def positionalIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(length(col("term")) > 0)
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"))

  /** Exact-phrase search over a positional index: classic postings
    * intersection — the i-th phrase token's postings join the first
    * token's on (doc, start+i). Every join is an equi-join on
    * (doc_id, adjusted pos); each side is a `term = <literal>` pruned
    * scan of the index, so cost scales with the phrase terms' postings
    * sizes, never the corpus. Returns per-doc match counts, ranked.
    */
  def phraseSearch(index: DataFrame, phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two tokens")
    val first = index.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos").as("start"))
    val matches = phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (t, i)) =>
      val next = index.filter(col("term") === t)
        .select(col("doc_id").as(s"_d$i"), col("pos").as(s"_p$i"))
      acc.join(next, acc("doc_id") === col(s"_d$i") &&
          col(s"_p$i") === acc("start") + i)
        .select(acc("doc_id"), acc("start"))
    }
    matches.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_pos"))
      .orderBy(col("n_matches").desc, col("doc_id"))
      .limit(k)
  }

  /** Proximity search: documents where `t1` and `t2` occur within
    * `slop` tokens of each other, ranked by co-occurring pair count.
    * Per-term position lists are compacted to one array per doc (each
    * bounded by doc length), the two sides equi-join on doc_id, and the
    * pair count is a nested HOF filter — O(|a|·|b|) per doc on arrays
    * that fit in a row, never a corpus-scale position self-join.
    */
  def proximitySearch(index: DataFrame, t1: String, t2: String,
                      slop: Int, k: Int): DataFrame = {
    require(t1 != t2,
      "proximity terms must differ (a term self-paired counts every position against itself)")
    def positions(t: String, out: String) =
      index.filter(col("term") === t)
        .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as(out))
    val joined = positions(t1, "pa").join(positions(t2, "pb"), "doc_id")
    val nPairs = aggregate(col("pa"), lit(0L), (acc, p) =>
      acc + size(filter(col("pb"), q => abs(q - p) <= slop)).cast("long"))
    joined.select(col("doc_id"), nPairs.as("n_pairs"))
      .filter(col("n_pairs") > 0)
      .orderBy(col("n_pairs").desc, col("doc_id"))
      .limit(k)
  }

  /** Top-k docs for a single term with a ±`context`-token snippet
    * around the FIRST occurrence — the result-highlighting half of a
    * search surface. Pure per-row array ops after a `array_contains`
    * scan filter; ranking is (tf desc, doc_id).
    */
  def searchSnippets(df: DataFrame, idCol: String, textCol: String,
                     term: String, k: Int, context: Int = 4): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val firstPos = array_position(toks, term) // 1-based, 0 when absent
    val tf = size(filter(toks, t => t === term)).cast("long")
    df.select(col(idCol).as("doc_id"), toks.as("t"), firstPos.as("p"), tf.as("tf"))
      .filter(col("p") > 0)
      .select(col("doc_id"), col("tf"),
        (col("p") - 1).cast("long").as("first_pos"),
        array_join(slice(col("t"), greatest(col("p") - context, lit(1L)).cast("int"),
          lit(2 * context + 1)), " ").as("snippet"))
      .orderBy(col("tf").desc, col("doc_id"))
      .limit(k)
  }

  /** Containment (quote) search: rank corpus documents by what
    * fraction of the QUERY's distinct n-gram shingles they contain —
    * the asymmetric signal (|A∩B| / |A|, A = query) that finds
    * supersets, quotes, and wrappers, which symmetric Jaccard near-dup
    * misses when the containing doc is much longer. The query's
    * shingle set derives from a literal in-plan (a corpus-size-
    * independent broadcast of at most |query| rows); the corpus side
    * is one shingle explode feeding a broadcast semi-style join, so
    * the only corpus-scale shuffle is the per-doc count aggregation.
    */
  def containmentSearch(df: DataFrame, idCol: String, textCol: String,
                        queryText: String, n: Int = 3, k: Int = 20): DataFrame = {
    require(queryText.trim.nonEmpty, "query text must be non-empty")
    containmentSearchDoc(df, idCol, textCol,
      df.sparkSession.range(1).select(lit(queryText).as(textCol)), n, k)
  }

  /** [[containmentSearch]] with the query passage supplied as a 1-row
    * frame (e.g. a corpus doc selected by id) — everything stays
    * in-plan; the query's shingle set broadcasts.
    */
  def containmentSearchDoc(df: DataFrame, idCol: String, textCol: String,
                           queryDoc: DataFrame, n: Int = 3, k: Int = 20): DataFrame = {
    // tokens bind to a real column under the Generate so the shingle
    // lambda reads a materialized array — inlining tokens() into the
    // explode re-evaluates split() per shingle index, O(tokens²)
    val q = queryDoc
      .select(TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(explode(TextAnalysis.shinglesFromTokens(col("_t"), n)).as("sh"))
    val nq = broadcast(q.agg(count(lit(1)).as("_nq")))
    val docSh = df
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col("doc_id"),
        explode(TextAnalysis.shinglesFromTokens(col("_t"), n)).as("sh"))
    docSh.join(broadcast(q), Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contained"))
      .crossJoin(nq)
      .select(col("doc_id"), col("n_contained"),
        round(col("n_contained").cast("double") / col("_nq").cast("double"), 6)
          .as("containment"))
      .orderBy(col("n_contained").desc, col("doc_id"))
      .limit(k)
  }

  /** Incremental index maintenance: apply a batch of upserts (new or
    * changed docs) and deletes to an existing postings frame without
    * rebuilding it. Affected doc_ids anti-join out of the old index,
    * fresh postings for the upserted docs union in — cost scales with
    * the BATCH (plus one pass over the stored index), not the corpus.
    * The oracle proves incremental ≡ from-scratch rebuild.
    *
    * 100 TB honesty note: a search-optimized index is laid out by term,
    * so the doc-keyed anti-join here is a full index pass. Real
    * deployments amortize it — tombstone the affected doc_ids (a
    * broadcast-able set per batch, filtered at read time) and fold
    * tombstones into the periodic compaction instead of rewriting per
    * batch. The algebra below is exactly what that compaction runs.
    */
  def updateIndex(postings: DataFrame, upserts: DataFrame,
                  deletes: DataFrame, idCol: String, textCol: String): DataFrame = {
    val affected = upserts.select(col(idCol).cast("long").as("doc_id"))
      .unionByName(deletes.select(col(deletes.columns.head).cast("long").as("doc_id")))
      .distinct()
    val kept = postings.join(broadcast(affected), Seq("doc_id"), "left_anti")
    kept.unionByName(invertedIndex(upserts, idCol, textCol)
      .select(col("doc_id"), col("term"), col("tf")))
      .select(col("term"), col("doc_id"), col("tf"))
  }

  /** Convenience one-shot: build the index in-plan and search it.
    * Two passes over the corpus (postings + the corpus-size count);
    * at scale you'd persist the postings frame and reuse it.
    */
  def searchDocs(df: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k: Int, k1: Double = 1.5): DataFrame =
    searchIndex(invertedIndex(df, idCol, textCol), terms, k,
      df.groupBy().agg(count(lit(1)).as("n")), k1)

  /** Hybrid retrieval: fuse a lexical top-n ([[searchDocs]] BM25-style
    * ranking) with an embedding top-n (brute-force cosine) by
    * reciprocal-rank fusion — rrf = Σ 1/(rrfK + rank), the standard
    * score-free fusion rule (ranks are integers, so the fused score is
    * the same two-term double expression on any engine; no cross-list
    * score normalization to get wrong). Docs appearing in only one
    * list contribute that list's term alone. Returns
    * (doc_id, rank_text, rank_vec, rrf) — ranks NULL where the doc
    * missed that list — top-k by (rrf desc, doc_id).
    *
    * Scale shape: each candidate list is its operator's own plan
    * (postings-bounded / scan + TakeOrdered); ranking windows run over
    * the n-row candidate lists, never the corpus, and the fusion join
    * is n×n.
    */
  def hybridSearch(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], emb: DataFrame, vecIdCol: String, vecCol: String,
      queryVec: Array[Double], n: Int = 50, k: Int = 20,
      rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = searchDocs(docs, idCol, textCol, terms, n)
      .withColumn("rank_text", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rank_text"))
    val v = Similarity.bruteForceTopK(emb, vecIdCol, vecCol, queryVec, n)
      .select(col(vecIdCol).cast("long").as("doc_id"),
        round(col("sim"), 6).as("_sim_r"))
      .withColumn("rank_vec", row_number().over(
        Window.orderBy(col("_sim_r").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rank_vec"))
    t.join(v, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("rank_text")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("rank_vec")), lit(0.0)),
        6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }
}
