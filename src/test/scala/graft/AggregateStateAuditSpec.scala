package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.scalatest.funsuite.AnyFunSuite

/** Aggregate-STATE audit (r13 verdict item 5) — the CodegenAuditSpec
  * pattern aimed at the other silent scale hazard: buffer-object
  * aggregates whose per-group state grows with the input. A
  * collect_list over an unbounded column or an exact percentile over a
  * high-cardinality domain holds every value of a group in one task's
  * memory — fine when the domain is provably bounded, an OOM time bomb
  * at 100 TB otherwise. This spec walks every `SparkEntry.queries`
  * optimized plan, collects every GROWING-buffer aggregate function
  * (exact Percentile/PercentileDisc/Median, CollectList, CollectSet,
  * PivotFirst — NOT the bounded-state sketches ApproximatePercentile /
  * HLL++ / CountMinSketch, whose buffers are fixed-size by design),
  * and fails if any use is not in the per-query allowlist below, each
  * entry of which documents WHY that input's domain is bounded.
  */
class AggregateStateAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Growing-buffer aggregate implementations: per-group state is
    * O(group values) (Percentile family: an OpenHashMap of distinct
    * values; Collect*: every row; PivotFirst: one slot per pivot key —
    * bounded by the pivot-key domain, so audited like the others).
    */
  private val hazardClasses: Set[String] = {
    val a = "org.apache.spark.sql.catalyst.expressions.aggregate."
    Set(a + "Percentile", a + "PercentileDisc", a + "Median",
      a + "CollectList", a + "CollectSet", a + "PivotFirst")
  }

  /** query -> allowed aggregate simple names, each with the bounded-
    * domain argument. An entry here is an adjudicated scale note, not
    * a waiver: the audit exists to fail when a NEW growing-buffer
    * aggregate sneaks into a timed plan undocumented. Recurring
    * arguments:
    *
    * - PER-DOC REASSEMBLY (dedup_passage, line_dedup, substring_dedup,
    *   dedup_shuffled): the collected list is one document's own
    *   chunks/lines/ids — state is bounded by the row that produced
    *   it, which already fits in a task by definition.
    * - DISTINCT-VALUE DOMAIN (percentiles, percentile_disc, winsorize,
    *   mad_outliers, ship_latency, bot_flags): Spark's exact
    *   Percentile buffers one OpenHashMap entry per DISTINCT value,
    *   not per row — integer cents bound the domain by the price
    *   range, day/second deltas by the calendar span, independent of
    *   row count. The row-count-independent scale path for order
    *   statistics is Layout.orderStats (two-level distributed rank;
    *   q_winsorized uses it); the exact forms stay where the DuckDB
    *   oracle pins R-7 / WITHIN GROUP semantics.
    * - BOUNDED PARAMETERIZATION (mmr_rerank, near_search,
    *   partition_plan, benford, url_rules, pivot): the collected set
    *   is a k-row candidate pool, a fixed bucket histogram, 9 digits,
    *   one host's robots rules, or 5 pivot keys — a parameter, not
    *   data volume.
    * - OUTPUT-SIZED STATE (string_agg, scd2_multi, seq_examples,
    *   pack_emit, survival_km, bloom_join): the aggregate's state IS
    *   the deliverable (a group's concatenation, a key's SCD2
    *   timeline, a window-framed history, a budget-capped pack, a
    *   calendar-bounded KM curve, a fixed-size Bloom bit set) — it
    *   cannot exceed what the consumer asked to materialize.
    */
  private val allowlist: Map[String, Set[String]] = Map(
    // 9 Benford digits per (global) group
    "q_benford" -> Set("CollectList"),
    // Bloom bit positions: set size <= the fixed filter width m
    "q_bloom_join" -> Set("CollectSet"),
    // per-user integer-second gap domain <= observed span; the heavy
    // user this could hurt on is exactly what the op exists to flag
    "q_bot_flags" -> Set("Percentile"),
    // per-doc passage list (reassembly of one row)
    "q_dedup_passage" -> Set("CollectList"),
    // member ids of one fingerprint's duplicate group (audit output)
    "q_dedup_shuffled" -> Set("CollectList"),
    // per-doc kept-line list (reassembly of one row)
    "q_line_dedup" -> Set("CollectList"),
    // distinct-cents domain per priority class
    "q_mad_outliers" -> Set("Percentile"),
    // k-row candidate pool (MMR reranks a bounded top-k)
    "q_mmr_rerank" -> Set("CollectList"),
    // bounded candidate pairs of one probe's pool
    "q_near_search" -> Set("CollectList"),
    // pack members <= token budget / min item size
    "q_pack_emit" -> Set("CollectList"),
    // fixed histogram-bucket frame
    "q_partition_plan" -> Set("CollectList"),
    // distinct-cents domain per priority; oracle pins WITHIN GROUP
    "q_percentile_disc" -> Set("PercentileDisc"),
    // distinct-cents domain per priority; oracle pins R-7
    "q_percentiles" -> Set("Percentile"),
    // 5 enumerated order-priority pivot keys
    "q_pivot" -> Set("PivotFirst"),
    // one key's SCD2 attribute timeline (dimension change history)
    "q_scd2_multi" -> Set("CollectList"),
    // window-framed history list (frame-bounded by construction)
    "q_seq_examples" -> Set("CollectList"),
    // distinct day-latency domain <= calendar span (the r13 verdict's
    // own bounded example)
    "q_ship_latency" -> Set("Percentile"),
    // STRING_AGG: the group's concatenation IS the requested output
    "q_string_agg" -> Set("CollectList"),
    // per-doc gram list (reassembly of one row)
    "q_substring_dedup" -> Set("CollectList"),
    // KM curve over distinct event days (calendar-bounded)
    "q_survival_km" -> Set("CollectList"),
    // one host's robots.txt prefix rules
    "q_url_rules" -> Set("CollectList"),
    // sq8CellBoundArrays: exactly |dims| = 64 (dim, bound) structs per
    // cell — training-state pivot of the nCells x dims bounds frame,
    // never a data column
    "q_sq8_local_gain" -> Set("CollectList"),
    "q_ivf_sq8_local" -> Set("CollectList"),
    // p01/p99 clip bounds: distinct-cents domain
    "q_winsorize" -> Set("Percentile"),
    // Layout.orderStats' final gather: |posExprs| picked rank rows
    // (2 here), never the column — the orderStats design note
    "q_winsorized" -> Set("CollectList"))

  test("every growing-buffer aggregate in a timed plan is allowlisted with a scale note") {
    val offenders = Seq.newBuilder[String]
    val stale = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      val found: Set[String] = plan.collectWithSubqueries { case p =>
        p.expressions.flatMap(_.collect {
          case ae: AggregateExpression
              if hazardClasses(ae.aggregateFunction.getClass.getName) =>
            ae.aggregateFunction.getClass.getSimpleName
        })
      }.flatten.toSet
      val allowed = allowlist.getOrElse(name, Set.empty)
      val extra = found -- allowed
      val missing = allowed -- found
      if (extra.nonEmpty) offenders += s"$name: ${extra.mkString(", ")}"
      if (missing.nonEmpty) stale += s"$name: ${missing.mkString(", ")}"
      spark.catalog.clearCache()
    }
    assert(offenders.result().isEmpty,
      "growing-buffer aggregates without a documented bounded-domain " +
        "note (add to the allowlist WITH the argument, or use a " +
        "bounded-state sketch):\n" + offenders.result().mkString("\n"))
    assert(stale.result().isEmpty,
      "stale allowlist entries (the plan no longer uses them — prune " +
        "so the audit stays authoritative):\n" +
        stale.result().mkString("\n"))
  }
}
