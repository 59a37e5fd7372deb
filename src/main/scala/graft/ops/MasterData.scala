package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Master-data management at corpus scale: entity resolution (record
  * linkage) over noisy identifier strings, and type-2
  * slowly-changing-dimension maintenance. Both are the reference-side
  * "one table, exact answers" problems re-expressed as bounded
  * equi-join plans: candidate generation never goes all-pairs, and
  * every merge decision is integer/string-exact so an external engine
  * replays the same entities and the same validity intervals.
  */
object MasterData {

  /** The default blocking-key family: the first `prefixLen` chars of
    * the name (pass "fwd" — survives edits near the tail) and the
    * first `revPrefixLen` chars of its reversal (pass "rev" — survives
    * edits near the head). The two prefix lengths are independent
    * because they control INDEPENDENT block sizes: the r9 verdict's
    * scale-killer was a reverse prefix short enough that its blocks
    * held ~1000 rows each while the forward blocks held ~15 — one
    * shared length cannot size both passes.
    */
  def prefixKeys(nameCol: Column, prefixLen: Int,
      revPrefixLen: Int): Seq[(String, Column)] = Seq(
    "fwd" -> substring(nameCol, 1, prefixLen),
    "rev" -> substring(reverse(nameCol), 1, revPrefixLen))

  /** One blocking pass over pre-assigned keys: drop blocks whose
    * document frequency exceeds `maxBlockDf` (join-key skew: a
    * boilerplate prefix shared by everything — the same stop-key
    * discipline as the shingle dedup family, mirrored by every oracle
    * so the drop is part of the contract), self-join the survivors on
    * the block key, and verify with exact `levenshtein` ≤ `maxDist`.
    * The `abs(length(a)-length(b)) <= maxDist` guard runs FIRST: edit
    * distance is bounded below by the length difference, so the guard
    * never changes the result but skips the O(len²) DP on pairs that
    * cannot match.
    */
  private def blockPass(b: DataFrame, maxDist: Int,
      maxBlockDf: Int): DataFrame = {
    val hot = b.groupBy(col("blk")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxBlockDf).select(col("blk"))
    // widen before the CPU-heavy verify (r17): the hot-list anti-join
    // broadcasts, so the levenshtein self-join otherwise runs at the
    // input's scan parallelism — a handful of tasks on a small corpus;
    // no-op when the scan is already wide (see Dedup.widen)
    val kept = Dedup.widen(b).join(broadcast(hot), Seq("blk"), "left_anti")
    kept.select(col("blk"), col("id").as("id_a"), col("nm").as("nm_a"))
      .join(kept.select(col("blk"), col("id").as("id_b"),
        col("nm").as("nm_b")), Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("nm_a")) - length(col("nm_b"))) <= maxDist)
      // thresholded levenshtein: banded O(len·maxDist) DP instead of
      // O(len²), returning -1 past the threshold — for surviving pairs
      // the value IS the true distance, so results are unchanged
      .select(col("blk"), col("id_a"), col("id_b"),
        levenshtein(col("nm_a"), col("nm_b"), maxDist).as("dist"))
      .filter(col("dist").between(0, maxDist))
  }

  private def withKeys(df: DataFrame, idCol: String, nameCol: String,
      keys: Seq[(String, Column)]): Seq[(String, DataFrame)] = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(nameCol).as("nm"))
    keys.map { case (p, k) =>
      p -> base.select(col("id"), col("nm"), k.as("blk"))
    }
  }

  /** Blocked record-linkage candidates over CALLER-SUPPLIED blocking
    * keys — one pass per key, so the key family is a parameter, not a
    * shape baked into the operator (prefixes, phonetic codes,
    * residue-class character subsequences, q-gram signatures — any
    * deterministic Column works). Candidate volume is
    * Σ_pass Σ_block |block|², never corpus², and each pass's blocks
    * are sized by ITS key. Provenance (pass, blk) is kept per pair so
    * incremental maintenance can retract exactly the pairs of a block
    * that later turns hot.
    */
  def linkagePairsByKeys(df: DataFrame, idCol: String, nameCol: String,
      keys: Seq[(String, Column)], maxDist: Int = 1,
      maxBlockDf: Int = 64): DataFrame = {
    require(keys.nonEmpty && maxDist >= 0 && maxBlockDf >= 2,
      "need >= 1 blocking key, maxDist >= 0, maxBlockDf >= 2")
    withKeys(df, idCol, nameCol, keys).map { case (p, b) =>
      blockPass(b, maxDist, maxBlockDf)
        .select(lit(p).as("pass"), col("blk"), col("id_a"), col("id_b"),
          col("dist"))
    }.reduce(_ unionByName _)
  }

  /** Multi-pass blocked record-linkage candidates, verified by exact
    * edit distance — the two-prefix default of [[linkagePairsByKeys]]
    * ([[prefixKeys]]), deduplicated across passes. `maxBlockDf`
    * defaults to 64: a kept block contributes ≤ maxBlockDf·|block|
    * pairs, so the cap is the operator's worst-case volume knob and
    * O(64) keeps the semi-cartesian bounded even when a key family
    * degenerates on some corpus (the r9 q_entities failure: ~1000-row
    * blocks slipping under a 1000 cap → 7.5M levenshtein pairs).
    * Blocks the cap drops are NOT silent: [[linkageAudit]] reports
    * them and [[pairReachability]] proves which probe pairs they make
    * unreachable.
    */
  def linkagePairs(df: DataFrame, idCol: String, nameCol: String,
      prefixLen: Int = 12, maxDist: Int = 1,
      maxBlockDf: Int = 64, revPrefixLen: Int = 0): DataFrame = {
    require(prefixLen >= 1, "need prefixLen >= 1")
    val rev = if (revPrefixLen >= 1) revPrefixLen else prefixLen
    linkagePairsByKeys(df, idCol, nameCol,
        prefixKeys(col("nm"), prefixLen, rev), maxDist, maxBlockDf)
      .select(col("id_a"), col("id_b"), col("dist"))
      .distinct()
  }

  /** Dropped-hot-block audit (no silent caps): per blocking pass, how
    * many blocks the `maxBlockDf` cap dropped, how many rows sit
    * inside them (rows whose pairs that pass cannot reach), and how
    * many blocks survived. One map-combinable aggregation per pass
    * over the block-frequency table — the audit never forms a pair.
    */
  def linkageAudit(df: DataFrame, idCol: String, nameCol: String,
      keys: Seq[(String, Column)], maxBlockDf: Int = 64): DataFrame =
    withKeys(df, idCol, nameCol, keys).map { case (p, b) =>
      b.groupBy(col("blk")).agg(count(lit(1)).as("_df"))
        .agg(
          coalesce(sum(when(col("_df") > maxBlockDf, lit(1L))), lit(0L))
            .as("n_blocks_dropped"),
          coalesce(sum(when(col("_df") > maxBlockDf, col("_df"))), lit(0L))
            .as("n_rows_in_dropped"),
          coalesce(sum(when(col("_df") <= maxBlockDf, lit(1L))), lit(0L))
            .as("n_blocks_kept"))
        .select(lit(p).as("pass"), col("n_blocks_dropped"),
          col("n_rows_in_dropped"), col("n_blocks_kept"))
    }.reduce(_ unionByName _)

  /** Recall audit for specific probe pairs: is (id_a, id_b) inside a
    * KEPT block of at least one pass — i.e. can blocking even present
    * the pair to the verifier? A pair inside only dropped blocks comes
    * back `reachable = false` instead of silently vanishing from
    * [[linkagePairs]] output. Cost: probes × passes membership
    * lookups (two equi-joins against the kept-block membership),
    * never a block self-join.
    */
  def pairReachability(df: DataFrame, idCol: String, nameCol: String,
      keys: Seq[(String, Column)], maxBlockDf: Int,
      probes: DataFrame): DataFrame = {
    val memb = withKeys(df, idCol, nameCol, keys).map { case (p, b) =>
      val hot = b.groupBy(col("blk")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") > maxBlockDf).select(col("blk"))
      b.join(broadcast(hot), Seq("blk"), "left_anti")
        .select(lit(p).as("pass"), col("blk"), col("id"))
    }.reduce(_ unionByName _)
    val pr = probes.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"))
    val ma = memb.select(col("pass"), col("blk"), col("id").as("id_a"))
    val mb = memb.select(col("pass").as("_pb"), col("blk").as("_bb"),
      col("id").as("_ib"))
    pr.join(ma, Seq("id_a"), "left")
      .join(mb, col("id_b") === col("_ib") && col("pass") === col("_pb") &&
        col("blk") === col("_bb"), "left")
      .groupBy(col("id_a"), col("id_b"))
      .agg(coalesce(max(col("_bb").isNotNull), lit(false)).as("reachable"))
  }

  /** [[linkagePairsByKeys]] restarted from STORED blocked state — the
    * members table of [[linkageMembers]] plus the per-block dfs of
    * [[linkageBlockDfs]], both plain parquet frames a linkage system
    * maintains between runs. Candidate generation then pays only the
    * hot-block anti-join and the bounded (pass, blk) self-join — the
    * corpus is never rescanned and the blocking keys are never
    * recomputed. Semantically identical to [[linkagePairsByKeys]] over
    * the corpus the members were derived from: the per-pass hot-block
    * drop is the same (members carry their pass), the length guard
    * still runs before the levenshtein DP, and provenance is kept.
    */
  def linkagePairsFromMembers(members: DataFrame, dfs: DataFrame,
      maxDist: Int = 1, maxBlockDf: Int = 64): DataFrame = {
    require(maxDist >= 0 && maxBlockDf >= 2,
      "need maxDist >= 0, maxBlockDf >= 2")
    val hot = dfs.filter(col("_df") > maxBlockDf)
      .select(col("pass"), col("blk"))
    // widen before the verify self-join — see [[blockPass]] (r17): the
    // stored members table is a small parquet fixture whose scan has a
    // handful of splits, and the broadcast anti-join preserves that
    // parallelism straight into the levenshtein stage (measured as ONE
    // 0.8 s 4-task job on a 32-core box)
    val kept = Dedup.widen(members)
      .join(broadcast(hot), Seq("pass", "blk"), "left_anti")
    kept.select(col("pass"), col("blk"), col("id").as("id_a"),
        col("nm").as("nm_a"))
      .join(kept.select(col("pass"), col("blk"), col("id").as("id_b"),
        col("nm").as("nm_b")), Seq("pass", "blk"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("nm_a")) - length(col("nm_b"))) <= maxDist)
      // banded thresholded levenshtein — see [[linkagePairs]]
      .select(col("pass"), col("blk"), col("id_a"), col("id_b"),
        levenshtein(col("nm_a"), col("nm_b"), maxDist).as("dist"))
      .filter(col("dist").between(0, maxDist))
  }

  /** [[resolveEntities]] over stored blocked state (see
    * [[linkagePairsFromMembers]]): the timed work is candidate
    * generation from the stored index, exact verification, and the
    * connected-components labeling — the daily-run shape, where the
    * corpus and its blocked index are state the previous run wrote.
    */
  def resolveEntitiesFromMembers(records: DataFrame, idCol: String,
      members: DataFrame, dfs: DataFrame, maxDist: Int = 1,
      maxBlockDf: Int = 64): DataFrame =
    // no pre-distinct: connectedComponents dedups the symmetrized edge
    // set anyway, so a cross-pass duplicate pair costs one exploded row,
    // not an extra corpus-pairs shuffle
    entitiesFromPairs(records, idCol,
      linkagePairsFromMembers(members, dfs, maxDist, maxBlockDf)
        .select(col("id_a"), col("id_b")))

  /** Entity resolution: [[linkagePairs]] candidates collapse into
    * entities via [[Dedup.connectedComponents]] (min-label
    * propagation, per-round checkpointed), each record labeled with
    * its entity id (the component's minimum record id — singletons
    * are their own entity), the entity size, and the canonical flag.
    * The only corpus-scale exchanges are the block join (bounded by
    * `maxBlockDf`) and one entity-keyed count; the CC loop moves
    * (id, label) pairs, not payloads.
    */
  def resolveEntities(df: DataFrame, idCol: String, nameCol: String,
      prefixLen: Int = 12, maxDist: Int = 1,
      maxBlockDf: Int = 64, revPrefixLen: Int = 0): DataFrame =
    entitiesFromPairs(df, idCol,
      linkagePairs(df, idCol, nameCol, prefixLen, maxDist, maxBlockDf,
        revPrefixLen))

  /** [[resolveEntities]] over a caller-supplied blocking-key family
    * (see [[linkagePairsByKeys]]).
    */
  def resolveEntitiesByKeys(df: DataFrame, idCol: String,
      nameCol: String, keys: Seq[(String, Column)], maxDist: Int = 1,
      maxBlockDf: Int = 64): DataFrame =
    entitiesFromPairs(df, idCol,
      linkagePairsByKeys(df, idCol, nameCol, keys, maxDist, maxBlockDf)
        .select(col("id_a"), col("id_b")).distinct())

  private[ops] def entitiesFromPairs(df: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val cc = Dedup.connectedComponents(pairs)
    val labeled = df.select(col(idCol).cast("long").as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id"))
        .as("entity_id"))
    val sizes = labeled.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"))
    labeled.join(sizes, Seq("entity_id"))
      .select(col("id"), col("entity_id"), col("n_members"),
        (col("id") === col("entity_id")).as("is_canonical"))
  }

  // ---- incremental entity resolution (r9 verdict item 4) ----

  /** The blocked-membership table an incremental linkage run stores:
    * one row per (pass, block, record). Together with
    * [[linkageBlockDfs]] and the provenance pairs of
    * [[linkagePairsByKeys]] this is the complete stored state — all
    * three are plain parquet-able frames a daily job reads and
    * rewrites incrementally.
    */
  def linkageMembers(df: DataFrame, idCol: String, nameCol: String,
      keys: Seq[(String, Column)]): DataFrame =
    withKeys(df, idCol, nameCol, keys).map { case (p, b) =>
      b.select(lit(p).as("pass"), col("blk"), col("id"), col("nm"))
    }.reduce(_ unionByName _)

  /** Per-block document frequencies of a membership table — one
    * map-combinable count, stored so an increment never rescans the
    * corpus to learn block sizes.
    */
  def linkageBlockDfs(members: DataFrame): DataFrame =
    members.groupBy(col("pass"), col("blk"))
      .agg(count(lit(1)).as("_df"))

  /** Incremental candidate maintenance: absorb a record BATCH into
    * stored linkage state without ever touching corpus² — the only
    * corpus-scale inputs are scans (stored members join the batch's
    * block keys; stored pairs anti-join the hot-block list). Exactly
    * ≡ rebuilding [[linkagePairsByKeys]] over stored ∪ batch:
    *   - blocks only GROW under a batch, so a block hot at store time
    *     stays hot (it had no stored pairs, and contributes none now);
    *   - a block the batch pushes over `maxBlockDf` turns hot NOW: its
    *     stored pairs are RETRACTED via their (pass, blk) provenance —
    *     this is why [[linkagePairsByKeys]] keeps provenance;
    *   - every new pair involves ≥1 batch record, so candidate volume
    *     is O(|batch| · blocksize), bounded by |batch| · maxBlockDf.
    */
  def linkagePairsIncrement(storedMembers: DataFrame,
      storedDfs: DataFrame, storedPairs: DataFrame, batch: DataFrame,
      idCol: String, nameCol: String, keys: Seq[(String, Column)],
      maxDist: Int = 1, maxBlockDf: Int = 64): DataFrame = {
    val bm = linkageMembers(batch, idCol, nameCol, keys)
    val bdf = bm.groupBy(col("pass"), col("blk"))
      .agg(count(lit(1)).as("_bdf"))
    val hot = storedDfs.join(bdf, Seq("pass", "blk"), "full")
      .filter(coalesce(col("_df"), lit(0L)) +
        coalesce(col("_bdf"), lit(0L)) > maxBlockDf)
      .select(col("pass"), col("blk"))
    val keptPairs = storedPairs
      .join(broadcast(hot), Seq("pass", "blk"), "left_anti")
    val keptBatch = bm.join(broadcast(hot), Seq("pass", "blk"), "left_anti")
    // widen the big (stored ∪ batch) side — see [[blockPass]] (r17)
    val keptAll = Dedup.widen(storedMembers.unionByName(bm))
      .join(broadcast(hot), Seq("pass", "blk"), "left_anti")
    val newPairs = keptBatch
      .select(col("pass"), col("blk"), col("id").as("_ia"),
        col("nm").as("_na"))
      .join(keptAll.select(col("pass"), col("blk"), col("id").as("_ib"),
        col("nm").as("_nb")), Seq("pass", "blk"))
      .filter(col("_ia") =!= col("_ib"))
      .filter(abs(length(col("_na")) - length(col("_nb"))) <= maxDist)
      .select(col("pass"), col("blk"),
        least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"),
        levenshtein(col("_na"), col("_nb"), maxDist).as("dist"))
      .filter(col("dist").between(0, maxDist))
      .distinct() // a batch-batch pair arrives in both orientations
    keptPairs.unionByName(newPairs)
  }

  /** Incremental [[resolveEntities]]: new pairs from
    * [[linkagePairsIncrement]] (O(batch·blocksize) candidate work),
    * then the same connected-components labeling over the maintained
    * pair set — labels may change globally (a batch record can bridge
    * two stored entities), which is inherent to entity resolution, but
    * the CC loop moves (id, label) pairs whose count is the MATCH
    * count, not the corpus.
    */
  def resolveEntitiesIncrement(records: DataFrame, idCol: String,
      storedMembers: DataFrame, storedDfs: DataFrame,
      storedPairs: DataFrame, batch: DataFrame, nameCol: String,
      keys: Seq[(String, Column)], maxDist: Int = 1,
      maxBlockDf: Int = 64): DataFrame =
    entitiesFromPairs(records, idCol,
      linkagePairsIncrement(storedMembers, storedDfs, storedPairs,
        batch, idCol, nameCol, keys, maxDist, maxBlockDf)
        .select(col("id_a"), col("id_b")).distinct())

  /** Type-2 slowly-changing-dimension merge: applies one batch of
    * updates to a dimension history, producing the new history. The
    * dimension carries (key, attr, valid_from, valid_to, is_current)
    * with epoch-second longs (engine-agnostic integers; the open row
    * has valid_to NULL). The batch reduces to ONE update per key —
    * the latest by (eff, attr) struct-max, a commutative aggregate —
    * then a key-keyed full-outer join against the CURRENT rows
    * decides per key:
    *   - attr changed and eff after the open row began → the open row
    *     closes at eff and a new open row starts at eff;
    *   - attr unchanged, no current row change, or a late-arriving
    *     eff ≤ valid_from → the current row passes through;
    *   - unknown key → a new open row is born at eff.
    * Historical (closed) rows pass through untouched. Scale shape:
    * the update reduce and the join share the key partitioning, the
    * history passthrough is a scan, and the 1-or-2 output rows per
    * joined key come from one explode — no window, no sort, nothing
    * driver-sided, which is what lets the same plan maintain a
    * billion-row dimension.
    */
  def scd2Merge(dim: DataFrame, updates: DataFrame): DataFrame = {
    val u = updates
      .groupBy(col("key"))
      .agg(max(struct(col("eff"), col("attr"))).as("_u"))
      .select(col("key"), col("_u.eff").as("_eff"), col("_u.attr").as("_attr"),
        lit(true).as("_has_u"))
    // presence markers, not attr-NULL checks: a legitimately-NULL attr
    // must not read as "key absent from this side"
    val cur = dim.filter(col("is_current"))
      .withColumn("_has_cur", lit(true))
    val hist = dim.filter(!col("is_current"))
      .select("key", "attr", "valid_from", "valid_to", "is_current")
    val row = (a: Column, f: Column, t: Column, c: Column) =>
      struct(a.as("attr"), f.as("valid_from"), t.as("valid_to"),
        c.as("is_current"))
    val joined = cur.join(u, Seq("key"), "full")
      .select(col("key"), explode(
        when(col("_has_cur").isNull, // unknown key: born open at eff
          array(row(col("_attr"), col("_eff"), lit(null).cast("long"),
            lit(true))))
        .when(col("_has_u").isNull || col("_attr") <=> col("attr") ||
            col("_eff") <= col("valid_from"), // no-op / late arrival
          array(row(col("attr"), col("valid_from"), col("valid_to"),
            lit(true))))
        .otherwise( // close the open row, start the new one
          array(
            row(col("attr"), col("valid_from"), col("_eff"), lit(false)),
            row(col("_attr"), col("_eff"), lit(null).cast("long"),
              lit(true))))).as("_r"))
      .select(col("key"), col("_r.attr"), col("_r.valid_from"),
        col("_r.valid_to"), col("_r.is_current"))
    hist.unionByName(joined)
  }

  /** Multi-change type-2 SCD merge: unlike [[scd2Merge]] (whose
    * contract is a CDC-COMPACTED batch — at most one effective change
    * per key, latest-wins, an intermediate version in the same batch
    * is deliberately dropped), this merge honors a batch carrying
    * SEVERAL genuine successive changes per key, emitting one version
    * row per surviving change. Per key the batch collects into an
    * eff-sorted array (map-combinable `collect_list`; per-key state is
    * THAT KEY's batch updates, bounded by batch size, never the
    * corpus), then a single fold builds the version chain:
    *   - updates with eff ≤ the open row's valid_from drop (late
    *     arrivals, as in [[scd2Merge]]);
    *   - equal-eff updates resolve to the max attr (the same tie-break
    *     as [[scd2Merge]]'s struct-max), by replacing the chain tail;
    *   - an update whose attr equals the chain's running tail
    *     collapses (a no-op change produces no version);
    *   - unknown keys chain from their FIRST update (nothing to be
    *     late against).
    * Chain element i closes at element i+1's eff; the last stays open.
    * Historical rows pass through untouched. The corpus-scale plan is
    * one key-keyed aggregate + one key-keyed full-outer join + one
    * explode — no window, no sort, same billion-row shape as
    * [[scd2Merge]].
    */
  def scd2MergeMulti(dim: DataFrame, updates: DataFrame): DataFrame = {
    val emptyChain = typedLit(Seq.empty[(Long, String)])
      .cast("array<struct<eff:bigint,attr:string>>")
    val u = updates
      .groupBy(col("key"))
      .agg(array_sort(collect_list(struct(col("eff"), col("attr"))))
        .as("_us"))
    val cur = dim.filter(col("is_current"))
      .withColumn("_has_cur", lit(true))
    val hist = dim.filter(!col("is_current"))
      .select("key", "attr", "valid_from", "valid_to", "is_current")
    val vfrom = coalesce(col("valid_from"), lit(Long.MinValue))
    val seed = when(col("_has_cur").isNotNull,
        array(struct(col("valid_from").as("eff"), col("attr"))))
      .otherwise(emptyChain)
    // `get` (0-based, null out-of-bounds) instead of element_at: the
    // tail probe of an empty chain must be null, not an ANSI error
    val chain = aggregate(
      filter(coalesce(col("_us"), emptyChain),
        x => x.getField("eff") > vfrom),
      seed,
      (acc, x) => {
        val last = get(acc, size(acc) - 1)
        val base = when(last.getField("eff") === x.getField("eff"),
          slice(acc, lit(1), size(acc) - 1)).otherwise(acc)
        val tail = get(base, size(base) - 1)
        when(tail.getField("attr") <=> x.getField("attr"), base)
          .otherwise(concat(base, array(x)))
      })
    val versions = transform(col("_chain"), (x, i) =>
      struct(x.getField("attr").as("attr"),
        x.getField("eff").as("valid_from"),
        get(col("_chain"), i + 1).getField("eff").as("valid_to"),
        (i === size(col("_chain")) - 1).as("is_current")))
    hist.unionByName(cur.join(u, Seq("key"), "full")
      .withColumn("_chain", chain)
      .select(col("key"), explode(versions).as("_r"))
      .select(col("key"), col("_r.attr"), col("_r.valid_from"),
        col("_r.valid_to"), col("_r.is_current")))
  }

  /** CDC changelog apply: folds a change log (op ∈ I/U/D, monotone
    * `seq`) into a snapshot — the Delta/Hudi MERGE shape. The log
    * reduces to ONE winner per key by commutative (seq, op, attr)
    * struct-max (last writer wins; the struct tie-break makes equal
    * seqs deterministic), then a single key-keyed full-outer join
    * against the snapshot emits: the log attr for a surviving I/U,
    * nothing for a D, the snapshot row untouched for keys the log
    * never mentions. Two key shuffles total, both map-combinable or
    * co-partitioned — a billion-row table absorbs a changelog in one
    * pass, and the result is byte-deterministic for any log order.
    */
  def cdcApply(snapshot: DataFrame, log: DataFrame): DataFrame = {
    val w = log
      .groupBy(col("key"))
      .agg(max(struct(col("seq"), col("op"), col("attr"))).as("_w"))
      .select(col("key"), col("_w.op").as("_op"), col("_w.attr").as("_attr"),
        lit(true).as("_has_log"))
    snapshot.withColumn("_has_snap", lit(true))
      .join(w, Seq("key"), "full")
      .filter(col("_has_log").isNull || col("_op") =!= "D")
      .select(col("key"),
        when(col("_has_log").isNotNull, col("_attr")).otherwise(col("attr"))
          .as("attr"))
  }

  /** Point-in-time (temporal) lookup of facts against a type-2 SCD
    * history: each fact joins the dimension VERSION that was valid at
    * its timestamp — valid_from ≤ ts < valid_to (an open row's NULL
    * valid_to reads as ∞). The join is an EQUI-join on the dimension
    * key with the validity window as a post-join filter: per key the
    * history holds a handful of versions, so the filter fans out by
    * the version count, never by time range — the scale-safe PIT
    * shape (a range-only join would be quadratic). Facts whose key
    * has no valid version at ts keep a NULL attr (left join), so late
    * or pre-history facts are visible, not dropped.
    */
  def scd2Lookup(facts: DataFrame, dim: DataFrame): DataFrame = {
    val d = dim.select(col("key"), col("attr").as("_dattr"),
      col("valid_from").as("_vf"),
      coalesce(col("valid_to"), lit(Long.MaxValue)).as("_vt"))
    facts
      .join(d, facts("key") === d("key") &&
        col("ts") >= col("_vf") && col("ts") < col("_vt"), "left")
      .select(facts("key"), col("ts"), col("_dattr").as("attr"))
  }
}
