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

  /** Multi-pass blocked record-linkage candidates, verified by exact
    * edit distance: records pair only inside a BLOCK (the first
    * `prefixLen` chars of the key — pass 1 — and of its reversal —
    * pass 2), so candidate volume is Σ_block |block|², never corpus².
    * The two passes give the classic complementary coverage: an edit
    * near the string's tail leaves the forward block intact, an edit
    * near the head leaves the reversed block intact. Oversized blocks
    * (join-key skew: a boilerplate prefix shared by everything) are
    * dropped by the `maxBlockDf` document-frequency cap — the same
    * stop-key discipline as the shingle dedup family, and mirrored by
    * the oracle so the drop is part of the contract. Survivors carry
    * `levenshtein` ≤ `maxDist` (built into both engines), computed
    * only on in-block pairs.
    */
  def linkagePairs(df: DataFrame, idCol: String, nameCol: String,
      prefixLen: Int = 12, maxDist: Int = 1,
      maxBlockDf: Int = 1000): DataFrame = {
    require(prefixLen >= 1 && maxDist >= 0 && maxBlockDf >= 2,
      "need prefixLen >= 1, maxDist >= 0, maxBlockDf >= 2")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(nameCol).as("nm"))
    def pass(key: Column): DataFrame = {
      val b = base.select(col("id"), col("nm"), key.as("blk"))
      val hot = b.groupBy(col("blk")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") > maxBlockDf).select(col("blk"))
      val kept = b.join(broadcast(hot), Seq("blk"), "left_anti")
      kept.select(col("blk"), col("id").as("id_a"), col("nm").as("nm_a"))
        .join(kept.select(col("blk"), col("id").as("id_b"),
          col("nm").as("nm_b")), Seq("blk"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("nm_a"), col("nm_b")).as("dist"))
        .filter(col("dist") <= maxDist)
    }
    pass(substring(col("nm"), 1, prefixLen))
      .unionByName(pass(substring(reverse(col("nm")), 1, prefixLen)))
      .distinct()
  }

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
      maxBlockDf: Int = 1000): DataFrame = {
    val pairs = linkagePairs(df, idCol, nameCol, prefixLen, maxDist,
      maxBlockDf)
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
