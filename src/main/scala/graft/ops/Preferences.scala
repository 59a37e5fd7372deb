package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-data QA — the audit pass an RLHF / DPO pipeline runs
  * over pairwise comparison labels before training on them. A
  * comparison row is (prompt, winner completion, loser completion);
  * real label sets carry three defect classes this module surfaces:
  * CONFLICTS (the same pair labeled in both directions by different
  * raters), INTRANSITIVITY (majority preferences forming a>b>c>a
  * cycles — no reward model can fit them consistently), and
  * imbalanced exposure (a completion that only ever appears as a
  * winner tells you nothing about its true strength).
  *
  * Scale shapes: everything is per-PROMPT grouped — conflict and
  * win-rate audits are single hash aggregations over (prompt, pair) /
  * (prompt, completion) keys (map-side combinable, exact integer
  * counts); the cycle audit joins the per-prompt MAJORITY-edge list
  * with itself twice, so its cost is bounded by per-prompt edge counts
  * (comparisons are rater-budgeted per prompt in practice), never by
  * the corpus. No floats in any decision — win rates are one rounded
  * division after exact counts.
  */
object Preferences {

  /** Normalize a comparison to its unordered pair plus a direction
    * flag: (lo, hi, lo_won). The pair key makes both directions of the
    * same matchup land in one group.
    *
    * Degenerate self-comparisons (win == lose — a completion "beating"
    * itself) are DROPPED, and that is the public contract: such a row
    * carries no preference signal, and classifying it either way would
    * silently inflate one side of a (lo, lo) group the conflict audit
    * can never flag (the oracle side's strict `win < lose` / `win >
    * lose` branches drop it the same way).
    */
  private def normalized(df: DataFrame, promptCol: String,
      winCol: String, loseCol: String): DataFrame =
    df.filter(col(winCol) =!= col(loseCol))
      .select(col(promptCol).as("prompt"),
        least(col(winCol), col(loseCol)).as("lo"),
        greatest(col(winCol), col(loseCol)).as("hi"),
        (col(winCol) < col(loseCol)).as("lo_won"))

  /** Per (prompt, unordered pair): votes in each direction, the vote
    * margin, and the conflict flag (both directions observed). One
    * aggregation; `n_lo_wins + n_hi_wins` is the pair's total vote
    * count.
    */
  def conflictAudit(df: DataFrame, promptCol: String,
      winCol: String, loseCol: String): DataFrame =
    normalized(df, promptCol, winCol, loseCol)
      .groupBy(col("prompt"), col("lo"), col("hi"))
      .agg(sum(when(col("lo_won"), 1L).otherwise(0L)).as("n_lo_wins"),
        sum(when(col("lo_won"), 0L).otherwise(1L)).as("n_hi_wins"))
      .withColumn("conflicted",
        col("n_lo_wins") > 0 && col("n_hi_wins") > 0)
      .withColumn("margin",
        abs(col("n_lo_wins") - col("n_hi_wins")))

  /** Per (prompt, completion): exact win/loss/game counts, the win
    * rate (one rounded division after integer counts), and the
    * Copeland score (wins − losses — the exact-integer strength
    * ranking that needs no iterative model fit). One explode + one
    * aggregation.
    */
  def winRates(df: DataFrame, promptCol: String,
      winCol: String, loseCol: String): DataFrame =
    df.select(col(promptCol).as("prompt"),
        explode(array(
          struct(col(winCol).as("completion"), lit(1L).as("w")),
          struct(col(loseCol).as("completion"), lit(0L).as("w"))))
          .as("s"))
      .select(col("prompt"), col("s.completion").as("completion"),
        col("s.w").as("w"))
      .groupBy(col("prompt"), col("completion"))
      .agg(sum(col("w")).as("wins"),
        sum(lit(1L) - col("w")).as("losses"),
        count(lit(1)).as("games"))
      .withColumn("win_rate",
        round(col("wins").cast("double") / col("games").cast("double"), 6))
      .withColumn("copeland", col("wins") - col("losses"))

  /** Per-rater agreement with the per-pair majority — the
    * preference-data twin of inter-annotator kappa: for every decided
    * (prompt, unordered pair) matchup (strict vote majority; ties carry
    * no consensus), how often does each rater's vote land on the
    * majority side? The chronically-disagreeing rater this surfaces is
    * the first thing an RLHF data audit quarantines. A rater's own
    * vote counts toward the majority it is compared against (the
    * standard consensus-agreement convention; with ≥3 raters a pair is
    * never decided by one vote alone).
    *
    * Returns (rater, n_votes, n_decided, n_majority, agreement) with
    * agreement = n_majority / n_decided rounded to 6 dp (NULL when the
    * rater has no votes on decided pairs). All counts exact BIGINTs;
    * self-comparisons (win == lose) are dropped per the [[normalized]]
    * contract.
    *
    * Scale shape: ONE comparison-grain shuffle (the pair groupBy); the
    * join back from votes to their pair's majority reuses the same
    * (prompt, lo, hi) key, and the final aggregate is rater-grain.
    */
  def raterAgreement(df: DataFrame, promptCol: String, winCol: String,
      loseCol: String, raterCol: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val v = df.filter(col(winCol) =!= col(loseCol))
      .select(col(promptCol).as("prompt"),
        least(col(winCol), col(loseCol)).as("lo"),
        greatest(col(winCol), col(loseCol)).as("hi"),
        (col(winCol) < col(loseCol)).as("lo_won"),
        col(raterCol).as("rater"))
      .persist(MEMORY_AND_DISK) // feeds the pair aggregate AND the join
    val p = v.groupBy(col("prompt"), col("lo"), col("hi"))
      .agg(sum(when(col("lo_won"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("lo_won"), 0L).otherwise(1L)).as("n_hi"))
    val decided = col("n_lo") =!= col("n_hi")
    v.join(p, Seq("prompt", "lo", "hi"))
      .groupBy(col("rater"))
      .agg(count(lit(1)).as("n_votes"),
        sum(when(decided, 1L).otherwise(0L)).as("n_decided"),
        sum(when(decided && col("lo_won") === (col("n_lo") > col("n_hi")),
          1L).otherwise(0L)).as("n_majority"))
      .withColumn("agreement", round(col("n_majority").cast("double") /
        when(col("n_decided") > 0, col("n_decided").cast("double")), 6))
  }

  /** Per-rater position-bias audit: of each rater's votes, how many
    * chose the completion that was SHOWN FIRST — the classic
    * presentation-order artifact in pairwise preference collection
    * (a rater who clicks the first option regardless of content shows
    * a share near 1.0; an order-blind rater sits near the dataset's
    * base rate). Degenerate win == lose self-comparisons are dropped,
    * same contract as [[normalized]]. Pure counting: one rater-grain
    * aggregation, exact BIGINTs, one rounded division.
    */
  def positionBias(df: DataFrame, winCol: String, loseCol: String,
      firstCol: String, raterCol: String): DataFrame =
    df.filter(col(winCol) =!= col(loseCol))
      .groupBy(col(raterCol).as("rater"))
      .agg(count(lit(1)).as("n_votes"),
        sum((col(winCol) === col(firstCol)).cast("long"))
          .as("n_first_won"))
      .withColumn("first_win_share",
        round(col("n_first_won").cast("double") /
          col("n_votes").cast("double"), 6))

  /** Per-rater length-bias audit: of each rater's votes with
    * different-length completions, how many chose the LONGER one — the
    * verbosity artifact reward models inherit from raters who equate
    * length with quality. Equal-length votes (including degenerate
    * self-comparisons) count as `n_len_ties` and stay out of the share
    * denominator (NULL when a rater has only ties). Callers supply the
    * two length columns, so the audit works for any length source
    * (token counts, characters, a metadata join). One rater-grain
    * aggregation, exact BIGINTs, one rounded division.
    */
  def lengthBias(df: DataFrame, winLen: Column, loseLen: Column,
      rater: Column): DataFrame =
    df.groupBy(rater.as("rater"))
      .agg(count(lit(1)).as("n_votes"),
        sum((winLen > loseLen).cast("long")).as("n_longer_won"),
        sum((winLen === loseLen).cast("long")).as("n_len_ties"))
      .withColumn("longer_win_share",
        round(col("n_longer_won").cast("double") /
          when(col("n_votes") - col("n_len_ties") > 0,
            (col("n_votes") - col("n_len_ties")).cast("double")), 6))

  /** Majority-preference 3-cycles per prompt: a → b is a majority edge
    * iff strictly more votes prefer a over b; a directed triangle
    * a→b→c→a is the smallest intransitivity certificate. Each cycle is
    * counted ONCE (the rotation starting at its smallest node), so
    * `n_cycles` is the exact number of cyclic completion triples.
    * Prompts with no cycle are absent — join back against the prompt
    * universe for a full report.
    *
    * Plan: the majority-edge list derives from [[conflictAudit]]'s
    * aggregate (tiny: one row per compared pair), then two self-joins
    * keyed on (prompt, node) — cost is Σ_prompt deg², bounded by the
    * per-prompt comparison budget, never corpus².
    */
  def majorityCycles(df: DataFrame, promptCol: String,
      winCol: String, loseCol: String): DataFrame = {
    val votes = conflictAudit(df, promptCol, winCol, loseCol)
    val edges = votes
      .filter(col("n_lo_wins") =!= col("n_hi_wins"))
      .select(col("prompt"),
        when(col("n_lo_wins") > col("n_hi_wins"), col("lo"))
          .otherwise(col("hi")).as("src"),
        when(col("n_lo_wins") > col("n_hi_wins"), col("hi"))
          .otherwise(col("lo")).as("dst"))
    edges.as("e1")
      .join(edges.as("e2"),
        col("e1.prompt") === col("e2.prompt") &&
          col("e1.dst") === col("e2.src"))
      .join(edges.as("e3"),
        col("e2.prompt") === col("e3.prompt") &&
          col("e2.dst") === col("e3.src") &&
          col("e3.dst") === col("e1.src"))
      // one rotation per cycle: the edge list starting at the min node
      .filter(col("e1.src") < col("e2.src") && col("e1.src") < col("e3.src"))
      .groupBy(col("e1.prompt").as("prompt"))
      .agg(count(lit(1)).as("n_cycles"))
  }
}
