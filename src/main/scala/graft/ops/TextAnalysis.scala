package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, token counting, quality scoring, language ID, and
  * document fingerprinting. Everything is composed from codegen'd
  * built-ins (`split`, `regexp_*`, higher-order array functions) — no
  * UDFs — so the operators stay inside whole-stage codegen and scale
  * linearly with executors; there is no shuffle in any per-document
  * metric.
  */
object TextAnalysis {

  /** Whitespace tokenization (lowercased). */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** BPE-ish token count: word pieces + punctuation as separate tokens,
    * the usual pre-tokenizer regex shape.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0))).cast("long")

  /** Per-document quality metrics (length, token stats, punctuation and
    * stopword ratios) — the standard cheap quality filters applied
    * before training-data selection.
    */
  /** Punctuation fraction of the text's characters — shared by
    * [[qualityMetrics]], [[qualityScore]], and
    * [[qualityFilterReasons]] so the rule has exactly one definition.
    */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9_\\s]", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  /** n-gram hash array for PER-ROW consumers (no explode), computed in
    * O(tokens) per row: [[shingleHashesFrom]]'s getItem lambda re-
    * evaluates its token-hash argument per n-gram unless the caller
    * materializes it behind a Generate barrier (see its docstring) —
    * fine for the exploded dedup paths, O(tokens²) when inlined in a
    * plain projection or filter (measured 45 s vs 3 s over the 10×
    * corpus). Here the n-gram hash is a fold of zip_with over shifted
    * slices: every array argument is evaluated once, the lambdas see
    * scalars. The hash value differs from shingleHashesFrom's
    * (chained 2-arg xxhash64 vs one n-arg xxhash64) but consumers of
    * this form use COUNTS (total vs distinct), which are hash-
    * agnostic modulo 64-bit collisions.
    */
  private def ngramHashesLinear(text: Column, n: Int): Column = {
    val th = tokenHashes(text)
    val sz = size(th)
    val chained = (2 to n).foldLeft(th) { (acc, j) =>
      zip_with(acc, slice(th, lit(j), greatest(sz - (j - 1), lit(0))),
        (a, b) => xxhash64(a, b))
    }
    // zip_with pads the shorter side with nulls, so entries past
    // sz - n + 1 hash a partial window — slice keeps the real n-grams
    when(sz >= n, slice(chained, lit(1), greatest(sz - (n - 1), lit(0))))
      .when(sz > 0, array(xxhash64(th))) // short doc: one whole-array gram
      // otherwise covers BOTH sz = 0 and NULL text (sz null): without
      // it a NULL-text row yields NULL grams, which turns the
      // qualityFilterReasons booleans (and `keep`) NULL — counted in
      // n_docs but skipped by every sum(reason), silently desyncing
      // the audit from its oracle (r7 advice). NULL text degrades to
      // the empty-doc path: zero grams, dup ratio 0.
      .otherwise(array().cast("array<bigint>"))
  }

  /** Duplicate-n-gram fraction (0 for empty docs) — the raw ratio
    * behind [[repetitionStats]] and [[qualityFilterReasons]].
    */
  def dupNgramRatio(text: Column, n: Int = 3): Column = {
    val sh = ngramHashesLinear(text, n)
    val tot = size(sh)
    when(tot === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(sh)).cast("double") / tot.cast("double"))
  }

  def qualityMetrics(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    Seq(
      length(text).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      (length(regexp_replace(text, "\\s", "")).cast("double") / greatest(nTok, lit(1.0))).as("avg_token_len"),
      punctRatio(text).as("punct_ratio"),
      (size(array_intersect(toks, lit(stopwordsEn.toArray))).cast("double") /
        greatest(lit(1.0), size(array_distinct(toks)).cast("double"))).as("stopword_ratio"))
  }

  /** Composite quality score in [0,1]: prefers mid-length documents with
    * some stopwords and limited punctuation. Deterministic, branch-free.
    */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text)).cast("double")
    val lengthScore = least(nTok / lit(20.0), lit(1.0)) // ramps to 1 at 20 tokens
    val punctScore = lit(1.0) - least(punctRatio(text) * lit(4.0), lit(1.0))
    val stop = size(array_intersect(tokens(text), lit(stopwordsEn.toArray))).cast("double")
    val stopScore = least(stop / lit(3.0), lit(1.0))
    ((lengthScore + punctScore + stopScore) / lit(3.0)).as("quality")
  }

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic
    * language identifier. Lists are intentionally small and disjoint.
    */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
  val stopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> stopwordsEn,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "un", "pas", "pour", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "uno", "no", "por", "para"))

  /** Heuristic language ID: argmax over per-language stopword hits on
    * the token set; 'und' (undetermined) when nothing matches. A when()
    * chain over greatest() keeps it a single codegen'd projection.
    */
  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val scores = stopwordsByLang.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> size(array_intersect(toks, lit(words.toArray)))
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && score > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Intra-document n-gram repetition columns (the Gopher-style
    * "duplicate n-gram fraction" quality rule): total n-grams, distinct
    * n-grams, and dup ratio = 1 − distinct/total, all from one pass
    * over the pre-hashed shingle array (64-bit hashes are injective
    * stand-ins for the n-gram strings, so the counts equal the string
    * counts). Pure per-row expressions — no shuffle, no UDF; a
    * 100 TB corpus filters on this during the scan.
    */
  def repetitionStats(text: Column, n: Int = 3): Seq[Column] = {
    val sh = ngramHashesLinear(text, n)
    val ratio = dupNgramRatio(text, n)
    Seq(size(sh).cast("long").as("n_ngrams"),
      size(array_distinct(sh)).cast("long").as("n_distinct"),
      round(ratio, 6).as("dup_ngram_ratio"),
      (ratio > 0.2).as("repetitious"))
  }

  /** Canonical-text fingerprint: md5 of whitespace-normalized lowercase
    * text. Two documents differing only in spacing/case collide — the
    * first-line exact-dedup key.
    */
  def fingerprintMd5(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** 64-bit rolling fingerprint over tokens: chained
    * acc = xxhash64(acc, token), computed with a higher-order aggregate
    * entirely inside codegen. Order-sensitive, unlike a token *set*
    * hash, and overflow-free under ANSI mode (a polynomial acc*31+h
    * would throw on long overflow).
    */
  def fingerprintRolling(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
    * the MOSS algorithm): hash every k-token gram, then keep the
    * MINIMUM hash of each w-wide window of consecutive grams. The
    * selected set is position-robust — any match of at least w+k-1
    * tokens between two documents is guaranteed to share a
    * fingerprint — while storing only ~2/(w+1) of the gram hashes,
    * which is what makes shipping per-doc fingerprints to a corpus-
    * wide index affordable at 100 TB.
    *
    * Built entirely from zip_with/least chains so every array argument
    * is evaluated ONCE per row (the transform-with-inlined-argument
    * O(tokens²) trap documented on [[ngramHashesLinear]] cannot
    * occur); cost is O(tokens·(k+w)) inside whole-stage codegen with
    * zero shuffle. Hashes are md5-prefix STRINGS (16 hex chars), not
    * xxhash64, so any engine with md5 replays the exact selection;
    * zip_with pads the shorter side with null and both concat_ws and
    * least skip nulls, which is exactly the truncation the windowing
    * needs. Documents shorter than k tokens contribute their single
    * partial gram; shorter than w grams, the minimum over all grams —
    * the standard "at least one fingerprint per non-empty doc" rule.
    *
    * Returns the doc's distinct fingerprints, sorted.
    */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    val toks = filter(tokens(text), t => length(t) > 0)
    val nTok = size(toks)
    // full k-gram strings: fold of shifted zip_with concat; trailing
    // partial grams (beyond position nTok-k+1) are sliced off, except
    // the n<k single partial gram
    val gramsAll = (2 to k).foldLeft(toks) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j), greatest(nTok - (j - 1), lit(0))),
        (a, b) => concat_ws(" ", a, b))
    }
    val grams = slice(gramsAll, lit(1),
      greatest(nTok - (k - 1), least(nTok, lit(1))))
    val hashes = transform(grams, g => substring(md5(g), 1, 16))
    val nH = size(hashes)
    // window minima: least-fold over w shifted copies; same truncation
    val minsAll = (2 to w).foldLeft(hashes) { (acc, j) =>
      zip_with(acc, slice(hashes, lit(j), greatest(nH - (j - 1), lit(0))),
        (a, b) => least(a, b))
    }
    val mins = slice(minsAll, lit(1),
      greatest(nH - (w - 1), least(nH, lit(1))))
    array_sort(array_distinct(mins))
  }

  /** PII scrub: redact emails, phone-like numbers, and long digit runs
    * (card/SSN-ish) — the cheap regex pass applied before training-data
    * release. Pure regexp_replace chain, codegen'd, oracle-able.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    // long pure-digit runs (cards/SSNs) before the looser phone shape,
    // or the phone pattern would swallow them
    val num = regexp_replace(email, "[0-9]{9,}", "<NUM>")
    regexp_replace(num, "\\+?[0-9][0-9()\\-. ]{7,}[0-9]", "<PHONE>")
  }

  /** Split a document into token chunks of `size` with `overlap` tokens
    * carried between consecutive chunks — the standard pre-training
    * windowing. Returns an array of chunk strings; explode for one row
    * per chunk. Stride must be positive (size > overlap).
    */
  def chunkTokens(text: Column, chunkSize: Int, overlap: Int = 0): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = tokens(text)
    val nChunks = greatest(
      ceil((size(toks).cast("double") - overlap) / stride).cast("int"), lit(1))
    filter(
      transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * stride + 1, lit(chunkSize)), " ")),
      c => length(c) > 0)
  }

  /** token-n-gram shingles (space-joined), the MinHash/Jaccard unit.
    * slice + array_join measured faster than the element_at+concat_ws
    * alternative (ANSI element_at pays per-element bounds machinery and
    * throws on sub-n-token docs); consumers persist the exploded
    * shingle table so this expression evaluates once per corpus pass.
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** [[shingles]] over an already-materialized token array column.
    * Callers that explode the result should bind the token array to a
    * real column first (`select(..., tokens.as("_t"))` then build from
    * `col("_t")` under the Generate): the transform lambda reads its
    * array argument once per slice, so an INLINED `split()` argument
    * is re-evaluated per shingle index — the same O(tokens²) trap
    * [[ngramHashesLinear]] documents (measured 3.8 s → 0.6 s on the
    * sf0.1 containment scan).
    */
  def shinglesFromTokens(toks: Column, n: Int = 3): Column =
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => array_join(slice(toks, i + 1, lit(n)), " ")),
        s => length(s) > 0))

  /** Per-token 64-bit hashes (empty tokens dropped). Feeds
    * [[shingleHashesFrom]]: hashing each token string ONCE here and
    * then combining n-grams over the long array is ~4.5x faster than
    * building each shingle string (`array_join` per shingle measured
    * as the dominant dedup cost) and ~15x faster than hashing
    * string-array slices inside the n-gram lambda.
    */
  def tokenHashes(text: Column): Column =
    transform(filter(tokens(text), t => length(t) > 0), t => xxhash64(t))

  /** token-n-gram shingles as 64-bit hashes, computed from a
    * PRE-MATERIALIZED token-hash column (a [[tokenHashes]] result bound
    * via `withColumn` — inlining the expression here would re-evaluate
    * it per n-gram, O(tokens²)). `xxhash64` of the n-long slice is the
    * shingle key; downstream joins/aggregates move 8-byte longs instead
    * of shingle strings. Distinct-hash counts equal distinct-string
    * counts because post-split tokens cannot contain the join
    * separator (space), making the string form injective.
    *
    * `distinct=false` skips the de-dup pass for consumers that are
    * duplicate-insensitive (min-hash: min over a multiset equals min
    * over its set).
    */
  def shingleHashesFrom(tokenHashCol: Column, n: Int = 3,
      distinct: Boolean = true): Column = {
    val sz = size(tokenHashCol)
    // n-arg xxhash64 folds its arguments exactly like xxhash64 of the
    // n-element array (verified bit-for-bit), so getItem reads replace
    // the former per-shingle slice() allocation — ~2x faster in the
    // interpreted lambda — without changing any hash value. Cases:
    // size>=n → sliding windows; 0<size<n → one shingle hashing the
    // whole (short) array (what slice produced); size=0 → no shingles;
    // null tokens → null (the when-chain has no otherwise).
    val sh = when(sz >= n,
        transform(sequence(lit(0), sz - n),
          i => xxhash64((0 until n).map(j => tokenHashCol.getItem(i + j)): _*)))
      .when(sz > 0, array(xxhash64(tokenHashCol)))
      .when(sz === 0, array().cast("array<bigint>"))
    if (distinct) array_distinct(sh) else sh
  }

  /** Per-source n-gram diversity: total vs distinct token-n-gram counts
    * and their ratio — the self-repetition audit that flags template-
    * heavy or machine-generated sources (low diversity) before they
    * dilute a training mixture (the per-source aggregate of the Gopher
    * duplicate-n-gram signal [[dupNgramRatio]] computes per document).
    * Shingles travel as 64-bit hashes ([[shingleHashesFrom]] — counts
    * are hash-agnostic modulo 64-bit collisions, and the string form is
    * injective per the separator argument there). One exploded pass,
    * one aggregate; the two count-distincts share the shuffle (Expand
    * ×2 over (source, 8-byte) rows).
    */
  def sourceDiversity(df: DataFrame, idCol: String, srcCol: String,
      textCol: String, n: Int = 3): DataFrame =
    Dedup.widen(df)
      .withColumn("_th", tokenHashes(col(textCol)))
      .select(col(srcCol).as("source"), col(idCol).as("id"),
        explode(shingleHashesFrom(col("_th"), n, distinct = false)).as("g"))
      .groupBy(col("source"))
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_grams"),
        countDistinct(col("g")).as("n_distinct"))
      .withColumn("diversity", round(
        col("n_distinct").cast("double") / col("n_grams").cast("double"), 6))

  /** Per-document out-of-vocabulary rate against the corpus's
    * top-`vocabK` token vocabulary — the coverage statistic consulted
    * when sizing a tokenizer. The vocabulary is a global top-k by
    * count (ties broken by token): a TakeOrdered of exactly `vocabK`
    * rows, broadcastable at ANY corpus size because k is fixed —
    * 32k-class tokenizer vocabs included (a 32768×(token,1) frame is
    * ~1 MB). One token-level broadcast left join + a per-doc
    * aggregate; nothing else shuffles at corpus scale.
    *
    * NOTE: the synthetic test corpus draws from a 31-token vocabulary,
    * so oracle-checked runs use a non-vacuous k (16); Round6Spec
    * asserts the identical plan shape (TakeOrdered + broadcast join,
    * no global sort) at k = 32768 and ScaleProbe times it at 10×.
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String, vocabK: Int): DataFrame = {
    require(vocabK > 0, "vocabK must be positive")
    val dt = df.select(col(idCol), explode(tokens(col(textCol))).as("w"))
    val vocab = dt.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabK)
      .select(col("w"), lit(1L).as("in_v"))
    dt.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        round(lit(1.0) - sum(coalesce(col("in_v"), lit(0L))).cast("double") /
          count(lit(1)).cast("double"), 6).as("oov_rate"))
  }

  /** C4/Gopher-style quality filter with REASON CODES: every rule is a
    * boolean column (too_short / too_long / high_punct / repetitious)
    * plus the composite `keep`, so a pipeline can both filter and
    * audit WHY documents drop — the per-source reason histogram is
    * what mixture curation actually consumes. All rules are pure
    * per-row codegen'd expressions (token counts, punctuation ratio,
    * duplicate-3-gram fraction over pre-hashed shingles): zero
    * shuffle, applied inline by a 100 TB scan.
    */
  def qualityFilterReasons(df: DataFrame, textCol: String,
      minTokens: Int = 10, maxTokens: Int = 5000,
      maxPunctRatio: Double = 0.1, maxDupNgramRatio: Double = 0.2): DataFrame = {
    // NULL text must degrade to the empty-doc path (too_short = true),
    // not NULL booleans: a NULL `keep` row counts in n_docs but skips
    // every sum(reason) aggregate, desyncing the audit (r7 advice)
    val t = coalesce(col(textCol), lit(""))
    val nTok = tokenCount(t)
    df.withColumn("too_short", nTok < minTokens)
      .withColumn("too_long", nTok > maxTokens)
      .withColumn("high_punct", punctRatio(t) > maxPunctRatio)
      .withColumn("repetitious", dupNgramRatio(t, 3) > maxDupNgramRatio)
      .withColumn("keep",
        !(col("too_short") || col("too_long") || col("high_punct") || col("repetitious")))
  }

  /** Per-source keep rate with a Wilson 95% score interval — the
    * uncertainty a data card should attach to any rate computed from a
    * finite source ("source X keeps 81% ± what?"). One pass of the
    * per-row [[qualityFilterReasons]] rules plus one group aggregate;
    * the interval arithmetic mirrors the oracle's expression tree term
    * for term, so the rounded bounds are engine-exact.
    */
  def keepRateCi(df: DataFrame, srcCol: String, textCol: String,
      z: Double = 1.96): DataFrame = {
    val q = qualityFilterReasons(df, textCol)
    val agg = q.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n"), sum(col("keep").cast("long")).as("n_keep"))
    val nD = col("n").cast("double")
    val p = col("n_keep").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD))) / denom
    agg.select(col("source"), col("n"), col("n_keep"),
      round(p, 6).as("keep_rate"),
      round(center - half, 6).as("ci_low"),
      round(center + half, 6).as("ci_high"))
  }

  /** One BPE merge iteration over the corpus — the inner statistic of
    * tokenizer training (Sennrich et al. 2016): count every adjacent
    * character pair inside every word, weighted by the word's corpus
    * frequency, and return the top-`topK` merge candidates.
    *
    * Scale shape: the corpus-sized token stream collapses FIRST to a
    * vocabulary-sized (word, count) frame (map-combinable groupBy — at
    * 100 TB the word-count aggregate is the only corpus-scale shuffle,
    * and it's the classic word-count), then pair extraction runs on
    * the tiny vocabulary frame. The top-k is a TakeOrdered of exactly
    * `topK` rows, ties broken by pair text — no global sort.
    */
  def bpePairStep(df: DataFrame, textCol: String, topK: Int = 50): DataFrame = {
    require(topK > 0, "topK must be positive")
    val wc = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val w = col("w")
    wc.select(col("wc"),
        explode(transform(sequence(lit(1), length(w) - 1),
          i => w.substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(topK)
  }

  /** Canonical Unicode text cleanup — the normalization pass a crawl
    * corpus runs before any dedup/quality stage (CCNet/OSCAR shape):
    * NFC composition (so visually identical strings hash identically),
    * control/format character strip (zero-widths, bidi marks, raw
    * control bytes), whitespace collapse, trim. All four stages are
    * engine-reproducible: NFC is stability-guaranteed across Unicode
    * versions, and the regex classes (`\p{Cc}`, `\p{Cf}`, ASCII `\s`)
    * mean the same thing to Java regex and RE2. Pure per-row codegen'd
    * work — the NFC step is a native Catalyst expression
    * ([[graft.functions.NfcNormalize]]) with an isNormalized fast path,
    * not a UDF — so the pass stays inside whole-stage codegen with
    * zero shuffle.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        graft.functions.StringExpressions.nfc_normalize(
          coalesce(text, lit(""))),
        "[\\p{Cc}\\p{Cf}]", ""),
      "\\s+", " "))

  /** Iterated BPE training (Sennrich et al. 2016): run `iterations`
    * merge rounds, each picking the most frequent adjacent symbol pair
    * (ties broken by pair text) and applying it greedily left-to-right
    * to the whole vocabulary before recounting. Returns the exact
    * deterministic merge sequence as (iter, lhs, rhs, cnt).
    *
    * Representation: each vocab word is an angle-bracketed symbol
    * string (`"the"` → `"<t><h><e>"`), so applying merge (l, r) is a
    * plain `replace(s, "<l><r>", "<lr>")` — string replace is
    * non-overlapping left-to-right in Spark and DuckDB alike, which is
    * exactly BPE's greedy merge order (`<a><a><a>` → `<aa><a>`), and
    * the brackets stop a pair from matching across symbol boundaries
    * (`<ab><c>` never matches `<b><c>`). Words containing the bracket
    * characters are excluded (mirrored by the oracle).
    *
    * Scale shape: the ONLY corpus-scale job is the initial word-count
    * shuffle, persisted once; each iteration is then two vocab-sized
    * jobs (pair-count top-1 + lineage-chained replace). The per-
    * iteration collect is a single row — the merge decision has to
    * reach the driver because it parameterizes the next plan.
    */
  def bpeTrain(df: DataFrame, textCol: String, iterations: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (merges, _, wc) = bpeLoop(df, textCol, iterations)
    wc.unpersist() // merges are collected; nothing else reads the vocab
    merges.toDF("iter", "lhs", "rhs", "cnt")
  }

  /** The words [[bpeTrain]]/[[bpeEncodeStats]] train on: length >= 2
    * (a 1-char word has no pair to merge) and free of the angle-bracket
    * delimiter characters.
    */
  def bpeTrainableWords(text: Column): Column =
    filter(tokens(text), w =>
      length(w) >= 2 && !w.contains("<") && !w.contains(">"))

  /** Shared BPE training loop: returns (merge sequence, final
    * vocabulary frame (w, s, wc) with all merges applied to the
    * bracketed symbol string `s`, the PERSISTED word-count root the
    * vocab frame's lineage reads). The caller owns the root's
    * unpersist: the merge chain on top of it is `iterations` string
    * replaces over a vocabulary-sized cached frame — cheap to replay
    * per consumer, so the final vocab itself is not re-persisted.
    */
  private def bpeLoop(df: DataFrame, textCol: String, iterations: Int)
      : (Seq[(Long, String, String, Long)], DataFrame, DataFrame) = {
    require(iterations > 0, "iterations must be positive")
    val wc = df.select(explode(bpeTrainableWords(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("w"), regexp_replace(col("w"), "(.)", "<$1>").as("s"), col("wc"))
      .persist()
    var vocab = wc
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (it <- 1 to iterations) {
      val syms = split(regexp_replace(col("s"), "^<|>$", ""), "><")
      val top = vocab
        .select(col("wc"), explode(zip_with(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      require(top.nonEmpty, s"vocabulary exhausted at iteration $it")
      val (l, r, cnt) = (top.head.getString(0), top.head.getString(1),
        top.head.getLong(2))
      merges += ((it.toLong, l, r, cnt))
      vocab = vocab.select(col("w"),
        replace(col("s"), lit(s"<$l><$r>"), lit(s"<$l$r>")).as("s"), col("wc"))
    }
    (merges.result(), vocab, wc)
  }

  /** Apply a freshly trained BPE merge sequence back to the corpus —
    * the encode half of tokenizer training: per corpus source, how many
    * words were encoded and how many BPE symbols they produced after
    * `iterations` merges (the compression curve a tokenizer team
    * tracks). Only trainable words ([[bpeTrainableWords]]) count, as in
    * training.
    *
    * Scale shape: encoding is computed per DISTINCT word on the
    * vocabulary frame (symbol count = split length — never per corpus
    * row), then the per-(source, word) count frame joins it on the
    * word key. Corpus-scale shuffles: the (source, word) groupBy and
    * that equi-join; both are the word-count shape. The merge loop
    * itself is [[bpeLoop]]: one corpus word count + 2 vocab-sized jobs
    * per iteration.
    */
  def bpeEncodeStats(df: DataFrame, textCol: String, srcCol: String,
      iterations: Int = 5): DataFrame = {
    // the word-count root stays persisted: the returned frame's lineage
    // reads it (the driver's cache-clear between queries releases it;
    // it is vocabulary-sized, not corpus-sized)
    val (_, vocab, _) = bpeLoop(df, textCol, iterations)
    val nSym = vocab.select(col("w"),
      size(split(regexp_replace(col("s"), "^<|>$", ""), "><")).cast("long")
        .as("n_sym"))
    val perSrcWord = df
      .select(col(srcCol).as("source"),
        explode(bpeTrainableWords(col(textCol))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    perSrcWord.join(nSym, Seq("w"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("n_sym")).as("n_bpe_tokens"))
      .withColumn("avg_symbols",
        round(col("n_bpe_tokens").cast("double") /
          col("n_words").cast("double"), 6))
  }

  /** [[bpeEncodeStats]] with an already-trained merge sequence — the
    * serving shape of tokenizer encoding: production encodes a corpus
    * against a STORED vocabulary (the merges a training job wrote),
    * it never retrains per batch. `merges` is the (lhs, rhs) chain in
    * training order (a tokenizer file is a few-KB artifact — driver-
    * side by nature, like the PQ codebooks). With the merges in hand
    * the per-word symbol count is a pure codegen'd string-replace
    * chain over the (source, word) count frame — ONE corpus-scale
    * shuffle (that groupBy) and zero driver round-trips, versus
    * training's per-iteration collect.
    *
    * Applying the replaces in merge order to the bracketed string is
    * exactly the lineage [[bpeTrain]]'s vocab frame carries, so the
    * stats are identical to [[bpeEncodeStats]] run at the same
    * iteration count.
    */
  def bpeEncodeStatsFromMerges(df: DataFrame, textCol: String,
      srcCol: String, merges: Seq[(String, String)]): DataFrame = {
    val s0 = regexp_replace(col("w"), "(.)", "<$1>")
    val sN = merges.foldLeft(s0) { case (c, (l, r)) =>
      replace(c, lit(s"<$l><$r>"), lit(s"<$l$r>"))
    }
    val nSym = size(split(regexp_replace(sN, "^<|>$", ""), "><"))
      .cast("long")
    df.select(col(srcCol).as("source"),
        explode(bpeTrainableWords(col(textCol))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .select(col("source"), col("c"), nSym.as("n_sym"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("n_sym")).as("n_bpe_tokens"))
      .withColumn("avg_symbols",
        round(col("n_bpe_tokens").cast("double") /
          col("n_words").cast("double"), 6))
  }

  /** Per-source token-distribution divergence: KL(source ‖ corpus)
    * over unigram distributions, plus the source's share of the global
    * vocabulary — the drift statistic a mixture pipeline watches to
    * catch a source whose content shifted between snapshots (a spiked
    * KL means the source no longer looks like the blend it was weighted
    * for). KL is finite by construction: every source token is in the
    * corpus distribution, so q > 0 wherever p > 0.
    *
    * Returns (source, n_tokens, n_vocab, kl) with kl rounded to 6 dp —
    * the sums run over vocabulary-sized frames (distinct words), where
    * double summation-order drift is far below the rounding grain (the
    * q_lm_score convention).
    *
    * Scale shape: ONE corpus-scale shuffle — the (source, word) count
    * aggregation with map-side partials. Global word counts re-aggregate
    * the per-source counts frame (vocab-sized, persisted), never a
    * second corpus scan; the p/q join is vocab × sources against a
    * broadcast global frame.
    */
  def sourceDivergence(df: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val perSrc = df
      .select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val global = perSrc.groupBy(col("w")).agg(sum(col("c")).as("gc"))
    val totals = perSrc.groupBy(col("source")).agg(sum(col("c")).as("n_src"))
    val gTot = global.agg(sum(col("gc")).as("n_all"))
    val p = col("c").cast("double") / col("n_src").cast("double")
    val q = col("gc").cast("double") / col("n_all").cast("double")
    perSrc
      .join(broadcast(global), Seq("w"))
      .join(broadcast(totals), Seq("source"))
      .crossJoin(broadcast(gTot))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_vocab"),
        // + 0.0 canonicalizes an IEEE -0.0 (a tiny negative sum rounded
        // to zero) to +0.0 so both engines hash the same bytes
        (round(sum(p * log(p / q)), 6) + lit(0.0)).as("kl"))
  }

  /** HTML/markup stripping — the extraction step between a web crawl
    * and every text operator in this library: drop script/style blocks
    * wholesale (their content is code, not prose), strip remaining
    * tags, decode the common entities, collapse whitespace. Pure
    * per-row codegen'd regexp chain — zero shuffle, linear scan, the
    * same 100 TB posture as the quality filters. The regexes stay in
    * the RE2-compatible subset ((?s), non-greedy, no backrefs) so any
    * engine reproduces them byte-for-byte.
    */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    // &amp; decodes LAST: "&amp;lt;" is the literal text "&lt;" — an
    // amp-first pass would double-decode it to "<"
    val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Vocabulary coverage curve: for each candidate vocab size v, the
    * share of all corpus tokens covered by the top-v words (frequency
    * desc, ties broken by word asc so the curve is deterministic) — the
    * statistic that sizes a tokenizer's word list / decides the OOV
    * budget before training one. Returns
    * (vocab_size, n_types_used, covered_tokens, coverage) with
    * n_types_used = min(v, distinct words).
    *
    * Scale shape: the corpus-scale shuffle is the word count (map-side
    * partials); everything after is VOCAB-sized — the ordinal sort is a
    * single-partition window over distinct words, fine up to
    * ~10M types (a 100 TB corpus's word vocabulary, not its token
    * stream; if types ever exceed that, pre-filter count >= 2 first —
    * hapaxes can never make a top-v cut that matters). The corpus is
    * never globally sorted.
    */
  def vocabCoverage(df: DataFrame, textCol: String,
      sizes: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val ord = Window.orderBy(col("c").desc, col("w"))
    val ranked = wc
      .withColumn("rk", row_number().over(ord))
      .withColumn("cum", sum(col("c")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = broadcast(ranked.agg(max(col("cum")).as("n_total"),
      max(col("rk")).as("n_types")))
    val sz = df.sparkSession.createDataFrame(
      sizes.map(v => Tuple1(v.toLong))).toDF("vocab_size")
    sz.crossJoin(tot)
      .join(ranked, col("rk") === least(col("vocab_size"), col("n_types")))
      .select(col("vocab_size"),
        least(col("vocab_size"), col("n_types")).as("n_types_used"),
        col("cum").as("covered_tokens"),
        round(col("cum").cast("double") / col("n_total").cast("double"), 6)
          .as("coverage"))
  }

  /** Full per-document analysis frame: doc identifier + all metrics. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      (Seq(col(idCol)) ++
        qualityMetrics(t) ++
        Seq(
          bpeishTokenCount(t).as("n_bpeish_tokens"),
          qualityScore(t),
          langId(t).as("lang_pred"),
          fingerprintMd5(t).as("fp_md5"),
          fingerprintRolling(t).as("fp_rolling"))): _*)
  }

  /** T5-style span-corruption planning: deterministic mask spans on a
    * per-doc stride grid. The doc's md5-derived offset picks the grid
    * phase (`off = md5("mask:id") % stride`), every `stride`-th token
    * from there starts a `spanLen`-token mask, and each span is
    * replaced by one `<extra_id_k>` sentinel (interior tokens drop) —
    * the denoising-objective prep a seq2seq pretraining pipeline runs
    * over the whole corpus. spanLen ≤ stride keeps spans disjoint, so
    * the span/token counts are pure row arithmetic and the corrupted
    * text is one indexed HOF pass — zero shuffle, engine-exact
    * (the oracle replays the same lambda over DuckDB lists).
    */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      stride: Int = 8, spanLen: Int = 3): DataFrame = {
    require(spanLen >= 1 && spanLen <= stride,
      "need 1 <= spanLen <= stride for disjoint spans")
    val off = conv(substring(
      md5(concat(lit("mask:"), col("id").cast("string"))), 1, 15), 16, 10)
      .cast("long") % stride
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    val n = size(toks).cast("long")
    // span starts are off, off+stride, ... < n
    val nSpans = when(n > col("_off"),
      floor((n - 1L - col("_off")) / stride) + 1L).otherwise(lit(0L))
    val lastStart = col("_off") + (col("n_spans") - 1L) * stride
    val masked = when(col("n_spans") > 0L,
      (col("n_spans") - 1L) * spanLen +
        least(lit(spanLen.toLong), n - lastStart)).otherwise(lit(0L))
    val corrupted = array_join(
      filter(
        transform(sequence(lit(0L), greatest(n - 1L, lit(0L))), i => {
          val rel = i - col("_off")
          when(n === 0L, lit(null).cast("string"))
            .when(rel >= 0L && pmod(rel, lit(stride.toLong)) < spanLen,
              when(pmod(rel, lit(stride.toLong)) === 0L,
                concat(lit("<extra_id_"),
                  floor(rel / stride).cast("string"), lit(">")))
                .otherwise(lit(null).cast("string")))
            .otherwise(element_at(toks, (i + 1L).cast("int")))
        }),
        x => x.isNotNull),
      " ")
    df.select(col(idCol).as("id"), col(textCol))
      .withColumn("_off", off)
      .withColumn("n_tokens", n)
      .withColumn("n_spans", nSpans)
      .withColumn("masked_tokens", masked)
      .withColumn("corrupt_ratio", round(
        when(col("n_tokens") > 0L,
          col("masked_tokens").cast("double") /
            col("n_tokens").cast("double")).otherwise(lit(0.0)), 6))
      .withColumn("corrupted_text", corrupted)
      .select(col("id"), col("n_tokens"), col("n_spans"),
        col("masked_tokens"), col("corrupt_ratio"), col("corrupted_text"))
  }

  /** The Gopher repetition-free quality word list (Rae et al. 2021,
    * Appendix A1.1.1): a document must contain at least two
    * OCCURRENCES of these to count as natural English.
    */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style quality rule audit (Rae et al. 2021, Appendix A) —
    * the OTHER published filter family next to [[qualityFilterReasons]]'
    * C4-ish rules: word-count bounds, mean word length in [3,10],
    * symbol-to-word ratio ('#' and '…'/'...' marks) ≤ 0.1, ≥ 80% of
    * words with an alphabetic character, and ≥ 2 stop-list occurrences.
    * (The line-level bullet/ellipsis rules don't apply to this
    * corpus's single-line documents and are covered by
    * [[Dedup.lineBoilerplate]]-style line ops.) Per-source violation
    * counts in ONE map-combinable aggregate over pure per-row
    * codegen'd expressions — zero extra shuffle, the 100 TB posture of
    * every per-row filter audit.
    */
  def gopherRules(df: DataFrame, srcCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val toks = tokens(t)
    val nTok = size(toks)
    val nTokD = greatest(nTok.cast("double"), lit(1.0))
    val meanWordLen =
      length(regexp_replace(t, "\\s", "")).cast("double") / nTokD
    val hashes = length(t) - length(regexp_replace(t, "#", ""))
    // both ellipsis spellings count as one mark each: ASCII "..."
    // (3 chars removed per mark) and U+2026 (1 char per mark)
    val ellipses = (length(t) -
      length(regexp_replace(t, "\\.\\.\\.", ""))).cast("double") / lit(3.0) +
      (length(t) - length(regexp_replace(t, "…", ""))).cast("double")
    val symbolRatio = (hashes.cast("double") + ellipses) / nTokD
    val alphaFrac = size(filter(toks,
      w => w.rlike("[a-z]"))).cast("double") / nTokD
    val stopOcc = size(filter(toks, w => w.isin(gopherStops: _*)))
    val r = df.select(col(srcCol).as("source"),
      (nTok < minWords || nTok > maxWords).as("v_word_count"),
      (meanWordLen < 3.0 || meanWordLen > 10.0).as("v_word_len"),
      (symbolRatio > 0.1).as("v_symbol"),
      (alphaFrac < 0.8).as("v_alpha"),
      (stopOcc < 2).as("v_stop"))
    val rules = Seq("v_word_count", "v_word_len", "v_symbol", "v_alpha", "v_stop")
    r.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (rules.map(c => sum(col(c).cast("long"))
            .as("n_" + c.stripPrefix("v_"))) :+
          sum((!rules.map(col).reduce(_ || _)).cast("long")).as("n_kept")): _*)
  }

  /** The classic UTF-8-decoded-as-Latin-1 double-encoding artifacts
    * (what ftfy fixes): 'Ã' starts every mojibake'd 2-byte sequence,
    * 'â€' every mojibake'd punctuation mark, 'Â' precedes mojibake'd
    * NBSP/guillemets, U+FFFD is the decoder's replacement char.
    */
  val mojibakeMarkers: Seq[String] =
    Seq("\u00C3", "\u00E2\u20AC", "\u00C2", "\uFFFD")

  /** Encoding-artifact audit: per-source document and occurrence
    * counts of the [[mojibakeMarkers]] — the corpus-cleaning signal
    * that says which sources were double-decoded upstream and need a
    * re-extraction, not a regex bandage. Occurrences are counted by
    * length difference under literal removal (exact integers), so the
    * whole audit is one map-combinable aggregate of codegen'd per-row
    * expressions — zero extra shuffle at any scale.
    */
  def mojibakeAudit(df: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val occs = mojibakeMarkers.map { m =>
      ((length(t) - length(replace(t, lit(m), lit("")))) /
        lit(m.length)).cast("long")
    }
    val total = occs.reduce(_ + _)
    df.select(col(srcCol).as("source"), total.as("_marks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("_marks") > 0).cast("long")).as("n_mojibake"),
        sum(col("_marks")).as("n_marks"))
      .withColumn("mojibake_rate",
        round(col("n_mojibake").cast("double") /
          col("n_docs").cast("double"), 6))
  }
}
