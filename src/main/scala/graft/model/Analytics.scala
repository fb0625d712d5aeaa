package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.UfcExprs._

/** Analytics models — one function per reference view
  * (the ufc/models/analytics SQL files), each a pure DataFrame transform over the
  * staging models. Sort-order parity notes: PG defaults are ASC NULLS LAST /
  * DESC NULLS FIRST (SURVEY §7.4.1), mirrored explicitly where a model's
  * ORDER BY column is nullable.
  */
object Analytics {

  /** fighters_by_wins.sql:1-10 (A1). */
  def fightersByWins(stgFightResults: DataFrame): DataFrame =
    stgFightResults
      .filter(col("winner").isNotNull && col("winner") =!= "")
      .groupBy(col("winner").as("fighter"))
      .agg(count(lit(1)).as("wins"))
      .orderBy(desc("wins"))

  /** fighters_by_ko_wins.sql:1-11. */
  def fightersByKoWins(stgFightResults: DataFrame): DataFrame =
    stgFightResults
      .filter(col("method_group") === "KO/TKO" &&
        col("winner").isNotNull && col("winner") =!= "")
      .groupBy(col("winner").as("fighter"))
      .agg(count(lit(1)).as("ko_wins"))
      .orderBy(desc("ko_wins"))

  /** fighters_by_submission_wins.sql:1-11. */
  def fightersBySubmissionWins(stgFightResults: DataFrame): DataFrame =
    stgFightResults
      .filter(col("method_group") === "Submission" &&
        col("winner").isNotNull && col("winner") =!= "")
      .groupBy(col("winner").as("fighter"))
      .agg(count(lit(1)).as("submission_wins"))
      .orderBy(desc("submission_wins"))

  /** fighters_by_non_decision_wins.sql:1-20 (P3 in-list). */
  def fightersByNonDecisionWins(stgFightResults: DataFrame): DataFrame =
    stgFightResults
      .filter(col("method_group").isin("KO/TKO", "Submission") &&
        col("winner").isNotNull && col("winner") =!= "")
      .groupBy(col("winner").as("fighter"))
      .agg(count(lit(1)).as("non_decision_wins"))
      .orderBy(desc("non_decision_wins"), asc("fighter"))

  /** fight_time_per_division.sql:1-13 (A4). */
  def fightTimePerDivision(stgFightResults: DataFrame): DataFrame =
    stgFightResults
      .filter(col("weightclass").isNotNull && col("fight_time_minutes").isNotNull)
      .groupBy("weightclass")
      .agg(
        count(lit(1)).as("fight_count"),
        avg(col("fight_time_minutes")).as("avg_fight_time_minutes"),
        avg(col("fight_time_seconds")).as("avg_fight_time_seconds"))
      .orderBy(desc("avg_fight_time_minutes"), desc("fight_count"), asc("weightclass"))

  /** fighters_best_record.sql:1-45 (U1 unpivot + A2 conditional sums). */
  def fightersBestRecord(stgFightResults: DataFrame): DataFrame = {
    val r1 = stgFightResults.select(col("fighter_1").as("fighter"),
      upper(col("outcome_1")).as("outcome"))
    val r2 = stgFightResults.select(col("fighter_2").as("fighter"),
      upper(col("outcome_2")).as("outcome"))
    r1.unionByName(r2)
      .filter(col("fighter").isNotNull && col("fighter") =!= "")
      .groupBy("fighter")
      .agg(
        count(lit(1)).as("total_fights"),
        sum(when(col("outcome") === "W", 1).otherwise(0)).as("wins"),
        sum(when(col("outcome") === "L", 1).otherwise(0)).as("losses"),
        sum(when(!col("outcome").isin("W", "L"), 1).otherwise(0)).as("nc"))
      .filter(col("total_fights") >= 10)
      .select(
        col("fighter"), col("wins"), col("losses"), col("nc"), col("total_fights"),
        when(col("total_fights") > 0,
          col("wins").cast("double") / col("total_fights"))
          .otherwise(lit(null).cast("double")).as("win_pct"))
      .orderBy(desc("win_pct"), desc("wins"), asc("losses"), asc("fighter"))
  }

  /** fightrers_by_avg_fight_time_min_5.sql:1-33 (sic — reference typo kept
    * in the citation; U1 + A4 + P7 post-agg filter). */
  def fightersByAvgFightTime(stgFightResults: DataFrame): DataFrame = {
    val base = stgFightResults
      .filter(col("fight_time_minutes").isNotNull)
      .select("fighter_1", "fighter_2", "fight_time_minutes")
    val f1 = base.select(col("fighter_1").as("fighter"), col("fight_time_minutes"))
    val f2 = base.select(col("fighter_2").as("fighter"), col("fight_time_minutes"))
    f1.unionByName(f2)
      .filter(col("fighter").isNotNull && col("fighter") =!= "")
      .groupBy("fighter")
      .agg(count(lit(1)).as("fight_count"),
        avg(col("fight_time_minutes")).as("avg_fight_time_minutes"))
      .filter(col("avg_fight_time_minutes") >= 5)
      .orderBy(desc("avg_fight_time_minutes"), desc("fight_count"))
  }

  /** clutch_wins.sql:1-38 (J3 join vs pre-agg totals). */
  def clutchWins(stgFightResults: DataFrame): DataFrame = {
    val f1 = stgFightResults.select(col("fighter_1").as("fighter"))
    val f2 = stgFightResults.select(col("fighter_2").as("fighter"))
    val totals = f1.unionByName(f2)
      .filter(col("fighter").isNotNull && col("fighter") =!= "")
      .groupBy("fighter")
      .agg(count(lit(1)).as("total_fights"))
    val eligible = totals.filter(col("total_fights") >= 10)
      .select(col("fighter").as("t_fighter"))
    stgFightResults
      .filter(col("round_number") >= 4 &&
        col("method_group").isin("KO/TKO", "Submission") &&
        col("winner").isNotNull && col("winner") =!= "")
      .join(broadcast(eligible), col("winner") === col("t_fighter"))
      .groupBy(col("winner").as("fighter"))
      .agg(count(lit(1)).as("clutch_wins"))
      .orderBy(desc("clutch_wins"), asc("fighter"))
  }

  /** championship_rounds_fought.sql:1-52 (A2 pivot sums + A7 having). */
  def championshipRoundsFought(stgFightResults: DataFrame): DataFrame = {
    val title = stgFightResults
      .filter(col("weightclass").ilike("%Title Bout%") &&
        !col("weightclass").ilike("%interim%") &&
        !col("weightclass").ilike("%tournament%"))
      .select("weightclass", "fighter_1", "fighter_2", "round_number")
    val f1 = title.select(col("fighter_1").as("fighter"), col("round_number"))
    val f2 = title.select(col("fighter_2").as("fighter"), col("round_number"))
    f1.unionByName(f2)
      .filter(col("fighter").isNotNull && col("fighter") =!= "")
      .groupBy("fighter")
      .agg(
        count(lit(1)).as("title_fights"),
        sum(when(col("round_number") === 4, 1)
          .when(col("round_number") >= 5, 2)
          .otherwise(0)).as("championship_rounds_fought"))
      .filter(col("title_fights") >= 5)
      .orderBy(desc("championship_rounds_fought"), desc("title_fights"), asc("fighter"))
  }

  /** title_fights.sql:1-21 (J1 left join; explicit DESC NULLS LAST, O2). */
  def titleFights(stgFightResults: DataFrame, stgEventDetails: DataFrame): DataFrame =
    stgFightResults
      .filter(col("weightclass").ilike("%Title Bout%"))
      .join(broadcast(stgEventDetails.select("event", "event_date", "event_year",
        "location")), Seq("event"), "left")
      .select(
        col("event"), col("bout"), col("weightclass"), col("method"),
        col("round_number"), col("time"), col("time_format"), col("winner"),
        col("url"), col("event_date"), col("event_year"), col("location"))
      .orderBy(desc_nulls_last("event_date"), asc("event"), asc("bout"))

  /** title_fight_results_by_fighter.sql:1-52. */
  def titleFightResultsByFighter(stgFightResults: DataFrame): DataFrame = {
    val title = stgFightResults
      .filter(col("weightclass").ilike("%Title Bout%"))
      .select("weightclass", "fighter_1", "fighter_2", "outcome_1", "outcome_2")
    val f1 = title.select(
      col("fighter_1").as("fighter"), col("weightclass").as("category"),
      when(upper(col("outcome_1")) === "W", 1).otherwise(0).as("title_fight_win"),
      when(upper(col("outcome_1")) === "L", 1).otherwise(0).as("title_fight_loss"))
    val f2 = title.select(
      col("fighter_2").as("fighter"), col("weightclass").as("category"),
      when(upper(col("outcome_2")) === "W", 1).otherwise(0).as("title_fight_win"),
      when(upper(col("outcome_2")) === "L", 1).otherwise(0).as("title_fight_loss"))
    f1.unionByName(f2)
      .filter(col("fighter").isNotNull && col("fighter") =!= "")
      .groupBy("fighter", "category")
      .agg(
        sum(col("title_fight_win")).as("title_fight_wins"),
        sum(col("title_fight_loss")).as("title_fight_losses"))
      .orderBy(desc("title_fight_wins"), asc("title_fight_losses"), asc("fighter"))
  }

  /** title_defenses.sql:1-72 (W1 partitioned row_number → Nth title win). */
  def titleDefenses(stgFightResults: DataFrame, stgEventDetails: DataFrame): DataFrame = {
    val titleWins = stgFightResults
      .join(broadcast(stgEventDetails.select("event", "event_date")), Seq("event"))
      .filter(col("winner").isNotNull && col("winner") =!= "" &&
        col("weightclass").ilike("%Title Bout%") &&
        !col("weightclass").ilike("%interim%") &&
        !col("weightclass").ilike("%tournament%"))
      .select(col("winner").as("fighter"),
        weightCategoryNoop(col("weightclass")).as("weight_category"),
        col("event_date"))
    val w = Window.partitionBy("fighter", "weight_category").orderBy("event_date")
    titleWins
      .filter(col("weight_category").isNotNull && col("weight_category") =!= "")
      .withColumn("title_win_number", row_number().over(w))
      .withColumn("is_defense", when(col("title_win_number") > 1, 1).otherwise(0))
      .groupBy("fighter", "weight_category")
      .agg(sum(col("is_defense")).as("title_defenses"))
      .filter(col("title_defenses") > 0)
      .orderBy(asc("weight_category"), desc("title_defenses"), asc("fighter"))
  }

  /** dominant_style_per_division_year.sql:1-47 (A9 + W6 dense_rank top-1). */
  def dominantStylePerDivisionYear(stgFightResults: DataFrame,
      stgEventDetails: DataFrame): DataFrame = {
    val counts = stgFightResults
      .join(broadcast(stgEventDetails.select("event", "event_year")), Seq("event"))
      .filter(col("weightclass").isNotNull && col("method_group").isNotNull &&
        col("event_year").isNotNull)
      .groupBy("weightclass", "event_year", "method_group")
      .agg(count(lit(1)).as("fight_count"))
    val w = Window.partitionBy("weightclass", "event_year")
      .orderBy(desc("fight_count"), asc("method_group"))
    counts
      .withColumn("style_rank", dense_rank().over(w))
      .filter(col("style_rank") === 1)
      .select(col("weightclass"), col("event_year"),
        col("method_group").as("winning_method"), col("fight_count"))
      .orderBy(desc("fight_count"), asc("weightclass"), asc("event_year"),
        asc("winning_method"))
  }

  /** fighters_by_longest_winning_streak.sql:1-79 — gaps-and-islands (W7):
    * running sum of non-wins forms the island id; count wins per island;
    * max per fighter; threshold 10. 4-key sequence order kept verbatim. */
  def fightersByLongestWinningStreak(stgFightResults: DataFrame,
      stgEventDetails: DataFrame): DataFrame = {
    val fights = stgFightResults
      .join(broadcast(stgEventDetails.select("event", "event_date")), Seq("event"), "left")
      .filter(col("fighter_1").isNotNull && col("fighter_2").isNotNull)
      .select(col("url").as("fight_id"), col("event"), col("bout"), col("event_date"),
        col("fighter_1"), col("fighter_2"), col("outcome_1"), col("outcome_2"))
    val f1 = fights.select(col("fight_id"), col("event"), col("bout"), col("event_date"),
      col("fighter_1").as("fighter"), upper(col("outcome_1")).as("outcome"))
    val f2 = fights.select(col("fight_id"), col("event"), col("bout"), col("event_date"),
      col("fighter_2").as("fighter"), upper(col("outcome_2")).as("outcome"))
    val seqW = Window.partitionBy("fighter")
      .orderBy(asc_nulls_last("event_date"), asc("event"), asc("bout"), asc("fight_id"))
    val runW = seqW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f1.unionByName(f2)
      .filter(col("fighter").isNotNull && col("fighter") =!= "")
      .withColumn("loss_group",
        sum(when(col("outcome") === "W", 0).otherwise(1)).over(runW))
      .filter(col("outcome") === "W")
      .groupBy("fighter", "loss_group")
      .agg(count(lit(1)).as("streak_length"))
      .groupBy("fighter")
      .agg(max(col("streak_length")).as("longest_win_streak"))
      .filter(col("longest_win_streak") >= 10)
      .orderBy(desc("longest_win_streak"), asc("fighter"))
  }

  /** consecutive_title_defenses.sql:1-100 — the second gaps-and-islands,
    * per (fighter, weight_category); defenses = wins-in-island minus the
    * title-winning fight itself (`max(greatest(win_streak - 1, 0))`). */
  def consecutiveTitleDefenses(stgFightResults: DataFrame,
      stgEventDetails: DataFrame): DataFrame = {
    val title = stgFightResults
      .join(broadcast(stgEventDetails.select("event", "event_date")), Seq("event"))
      .filter(col("weightclass").ilike("%Title Bout%") &&
        !col("weightclass").ilike("%interim%") &&
        !col("weightclass").ilike("%tournament%") &&
        col("event_date").isNotNull)
      .select(col("event_date"),
        weightCategoryNoop(col("weightclass")).as("weight_category"),
        col("fighter_1"), col("fighter_2"), col("outcome_1"), col("outcome_2"))
    def side(f: String, o: String) = title.select(
      col(f).as("fighter"), col("weight_category"), col("event_date"),
      when(upper(col(o)) === "W", "W")
        .when(upper(col(o)) === "L", "L")
        .otherwise(lit(null).cast("string")).as("result"))
    val runW = Window.partitionBy("fighter", "weight_category")
      .orderBy("event_date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    side("fighter_1", "outcome_1").unionByName(side("fighter_2", "outcome_2"))
      .filter(col("fighter").isNotNull && col("fighter") =!= "" &&
        col("weight_category").isNotNull && col("weight_category") =!= "" &&
        col("result").isin("W", "L"))
      .withColumn("loss_group",
        sum(when(col("result") === "L", 1).otherwise(0)).over(runW))
      .groupBy("fighter", "weight_category", "loss_group")
      .agg(count(when(col("result") === "W", 1)).as("win_streak"))
      .groupBy("fighter", "weight_category")
      .agg(max(greatest(col("win_streak") - 1, lit(0)))
        .as("max_consecutive_title_defenses"))
      .filter(col("max_consecutive_title_defenses") >= 1)
      .orderBy(desc("max_consecutive_title_defenses"), asc("fighter"),
        asc("weight_category"))
  }

  /** quality_of_opposition_faced.sql:1-90 (J4 self-join on fight_id +
    * W8 point-in-time prior frame + W9 whole-partition career sum). */
  def qualityOfOppositionFaced(stgFightResults: DataFrame,
      stgEventDetails: DataFrame): DataFrame = {
    val fights = stgFightResults
      .join(broadcast(stgEventDetails.select("event", "event_date")), Seq("event"))
      .filter(col("winner").isNotNull && col("winner") =!= "")
      .select(col("url").as("fight_id"), col("event"), col("bout"), col("event_date"),
        col("fighter_1"), col("fighter_2"), col("winner"))
    def side(f: String, o: String) = fights.select(
      col("fight_id"), col("event"), col("bout"), col("event_date"),
      col(f).as("fighter"), col(o).as("opponent"),
      when(col("winner") === col(f), 1).otherwise(0).as("is_win"))
    val rows = side("fighter_1", "fighter_2").unionByName(side("fighter_2", "fighter_1"))
    val ord = Window.partitionBy("fighter")
      .orderBy(asc_nulls_last("event_date"), asc("event"), asc("bout"), asc("fight_id"))
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy("fighter")
    val records = rows.select(
      col("fight_id"), col("fighter"), col("opponent"), col("is_win"),
      sum(col("is_win")).over(prior).as("prior_wins"),
      sum(when(col("is_win") === 1, 0).otherwise(1)).over(prior).as("prior_losses"),
      sum(col("is_win")).over(whole).as("career_wins"))
    val opp = records.select(
      col("fight_id").as("o_fight_id"), col("fighter").as("o_fighter"),
      col("prior_wins").as("o_prior_wins"), col("prior_losses").as("o_prior_losses"),
      col("career_wins").as("o_career_wins"))
    records
      .filter(col("fighter").isNotNull && col("fighter") =!= "")
      .join(opp, col("fight_id") === col("o_fight_id") &&
        col("opponent") === col("o_fighter"))
      .groupBy("fighter")
      .agg(
        count(lit(1)).as("fights"),
        max(col("career_wins")).as("wins"),
        avg(when(col("o_prior_wins") + col("o_prior_losses") > 0,
          col("o_prior_wins").cast("double") /
            (col("o_prior_wins") + col("o_prior_losses")))
          .otherwise(lit(null).cast("double"))).as("avg_opponent_win_pct_at_time"),
        avg(col("o_career_wins").cast("double")).as("avg_opponent_career_wins"))
      .filter(col("wins") >= 10)
      .orderBy(desc("wins"), desc_nulls_first("avg_opponent_win_pct_at_time"),
        desc("avg_opponent_career_wins"), asc("fighter"))
  }

  /** wins_over_champions.sql:1-74 (J5 theta join: equi on opponent name +
    * `first_title_win_date <= event_date` residual). */
  def winsOverChampions(stgFightResults: DataFrame,
      stgEventDetails: DataFrame): DataFrame = {
    val ev = broadcast(stgEventDetails.select("event", "event_date"))
    val champions = stgFightResults
      .join(ev, Seq("event"))
      .filter(col("winner").isNotNull && col("winner") =!= "" &&
        col("weightclass").ilike("%Title Bout%") &&
        !col("weightclass").ilike("%interim%") &&
        !col("weightclass").ilike("%tournament%"))
      .groupBy(col("winner").as("champ_fighter"))
      .agg(min(col("event_date")).as("first_title_win_date"))
    val withOpponent = stgFightResults
      .join(ev, Seq("event"))
      .filter(col("winner").isNotNull && col("winner") =!= "")
      .select(
        col("url").as("fight_id"), col("event"), col("bout"), col("weightclass"),
        col("event_date"), col("winner").as("fighter"),
        when(col("winner") === col("fighter_1"), col("fighter_2"))
          .otherwise(col("fighter_1")).as("opponent"))
    withOpponent
      .join(broadcast(champions),
        col("champ_fighter") === col("opponent") &&
          col("first_title_win_date") <= col("event_date"))
      .select("fighter", "opponent", "event_date", "event", "bout", "weightclass")
      .orderBy(desc_nulls_first("event_date"), asc("fighter"), asc("opponent"))
  }

  /** wins_over_champions_agg.sql:1-12 (A6 exact count-distinct). */
  def winsOverChampionsAgg(winsOverChampions: DataFrame): DataFrame =
    winsOverChampions
      .filter(col("fighter").isNotNull && col("fighter") =!= "")
      .groupBy("fighter")
      .agg(countDistinct(col("opponent")).as("wins_over_champions"))
      .orderBy(desc("wins_over_champions"), asc("fighter"))

  /** multi_division_champs.sql:1-54 (A5/A9 over the titleFights view). */
  def multiDivisionChamps(titleFights: DataFrame): DataFrame =
    titleFights
      .filter(col("winner").isNotNull && col("winner") =!= "" &&
        col("weightclass").isNotNull &&
        !col("weightclass").ilike("%interim%") &&
        !col("weightclass").ilike("%tournament%"))
      .select(col("winner").as("fighter"),
        weightCategoryNoop(col("weightclass")).as("weight_category"),
        col("event_date"))
      .filter(col("weight_category").isNotNull && col("weight_category") =!= "")
      .groupBy("fighter", "weight_category")
      .agg(count(lit(1)).as("title_wins_in_category"),
        min(col("event_date")).as("first_title_win_date"),
        max(col("event_date")).as("last_title_win_date"))
      .groupBy("fighter")
      .agg(count(lit(1)).as("distinct_title_categories"),
        sum(col("title_wins_in_category")).as("total_title_wins"))
      .filter(col("distinct_title_categories") >= 2)
      .select(col("fighter"), col("distinct_title_categories"), col("total_title_wins"),
        when(col("distinct_title_categories") >= 3, "triple")
          .otherwise("double").as("champ_type"))
      .orderBy(desc("distinct_title_categories"), desc("total_title_wins"), asc("fighter"))

  /** total_champ_days.sql:1-26 (A8 sum of date-diffs; asOf parameterizes
    * the reference's current_date for deterministic tests). */
  def totalChampDays(titleReigns: DataFrame,
      asOf: org.apache.spark.sql.Column = current_date()): DataFrame =
    titleReigns
      .filter(col("start_date").isNotNull)
      .select(col("weight_category"), col("fighter"), col("start_date"),
        coalesce(col("end_date"), asOf).as("effective_end_date"))
      .groupBy("weight_category", "fighter")
      .agg(sum(datediff(col("effective_end_date"), col("start_date")))
        .as("total_champ_days"))
      .orderBy(desc("total_champ_days"), asc("weight_category"), asc("fighter"))

  /** title_reigns.sql:1-317 — the 12-CTE reign reconstruction: undisputed
    * succession via lag/lead (W4/W5), interim fallback (J8), scored fuzzy
    * name resolution of scraped vacancies (J6+W2), interval-joined status
    * changes (J7), and the final day-count projection. */
  def titleReigns(stgFightResults: DataFrame, stgEventDetails: DataFrame,
      rawVacancies: DataFrame): DataFrame = {
    val ev = broadcast(stgEventDetails.select("event", "event_date"))

    // title_fights / normalized_title_fights (:3-36)
    val undisputed = stgFightResults
      .join(ev, Seq("event"))
      .filter(col("weightclass").ilike("%Title Bout%") &&
        !col("weightclass").ilike("%interim%") &&
        !col("weightclass").ilike("%tournament%") &&
        col("winner").isNotNull &&
        col("weightclass").isNotNull && col("weightclass") =!= "")
      .select(col("event"), col("event_date"), col("winner"),
        col("fighter_1"), col("fighter_2"),
        weightCategory(col("weightclass")).as("weight_category"))

    // interim_title_fights / normalized_interim_fights (:37-75)
    val interim = stgFightResults
      .join(ev, Seq("event"))
      .filter(col("weightclass").ilike("%Title Bout%") &&
        col("weightclass").ilike("%interim%") &&
        !col("weightclass").ilike("%tournament%") &&
        col("winner").isNotNull &&
        col("weightclass").isNotNull && col("weightclass") =!= "")
      .select(col("event"), col("event_date"), col("winner"),
        weightCategoryFull(col("weightclass")).as("weight_category"))

    // champion_events (:76-87): lag over (category; event_date, event)
    val champW = Window.partitionBy("weight_category").orderBy("event_date", "event")
    val championEvents = undisputed.select(
      col("weight_category"), col("winner").as("fighter"),
      col("event_date").as("start_date"), col("event"),
      lag(col("winner"), 1).over(champW).as("previous_champion"))

    // latest_undisputed (:88-94)
    val latestUndisputed = undisputed.groupBy("weight_category")
      .agg(max(col("event_date")).as("last_undisputed_date"))

    // latest_interim (:95-106)
    val interimW = Window.partitionBy("weight_category")
      .orderBy(desc("event_date"), desc("event"))
    val latestInterim = interim.select(
      col("weight_category"), col("winner").as("fighter"),
      col("event_date").as("start_date"), col("event"),
      row_number().over(interimW).as("interim_rank"))

    // interim_fallback (:107-121): latest interim newer than any undisputed
    val interimFallback = latestInterim
      .filter(col("interim_rank") === 1)
      .join(latestUndisputed, Seq("weight_category"), "left")
      .filter(col("last_undisputed_date").isNull ||
        col("last_undisputed_date") < col("start_date"))
      .select(col("weight_category"), col("fighter"), col("start_date"),
        lit(null).cast("date").as("next_champion_date"))

    // new_champion_events (:122-140): change-of-champion rows + lead, then
    // union with the interim fallback
    val leadW = Window.partitionBy("weight_category").orderBy("start_date", "event")
    val newChampionEvents = championEvents
      .filter(col("previous_champion").isNull ||
        col("fighter") =!= col("previous_champion"))
      .select(col("weight_category"), col("fighter"), col("start_date"),
        lead(col("start_date"), 1).over(leadW).as("next_champion_date"))
      .unionByName(interimFallback)

    // fighter_name_lookup (:141-159)
    val lookup = undisputed.select(col("weight_category"), col("fighter_1").as("fighter_name"))
      .unionByName(undisputed.select(col("weight_category"), col("fighter_2").as("fighter_name")))
      .filter(col("fighter_name").isNotNull && col("fighter_name") =!= "")
      .distinct()
      .select(col("weight_category"), col("fighter_name"),
        firstName(col("fighter_name")).as("first_name"),
        lastName(col("fighter_name")).as("last_name"))

    // status_changes (:160-207): date ladder, token/category cleaning,
    // global row_number id over the RAW ordering columns
    val statusW = Window.orderBy("change_date", "fighter", "weight_category")
    val statusChanges = rawVacancies
      .select(dateLadder(col("date")).as("change_date"),
        col("fighter"), col("weight_category"), col("reason"))
      .filter(col("change_date").isNotNull &&
        col("fighter").isNotNull && col("fighter") =!= "" &&
        col("weight_category").isNotNull && col("weight_category") =!= "")
      .withColumn("status_id", row_number().over(statusW))
      .select(col("status_id"), col("change_date"),
        championshipCategory(col("weight_category")).as("weight_category"),
        fighterToken(col("fighter")).as("fighter_token"),
        col("reason"))

    // status_fighter_matches + status_best_match (:208-248): scored fuzzy
    // join on category + name predicates, best match per status row
    val matchCond = statusChanges("weight_category") === lookup("weight_category") &&
      (lower(col("fighter_token")) === lower(col("fighter_name")) ||
        lower(col("fighter_token")) === lower(col("first_name")) ||
        lower(col("fighter_token")) === lower(col("last_name")) ||
        lower(col("fighter_name")).contains(lower(col("fighter_token"))))
    val matchScore =
      when(lower(col("fighter_token")) === lower(col("fighter_name")), 3)
        .when(lower(col("fighter_token")) === lower(col("last_name")), 2)
        .when(lower(col("fighter_token")) === lower(col("first_name")), 2)
        .when(lower(col("fighter_name")).contains(lower(col("fighter_token"))), 1)
        .otherwise(0)
    val bestW = Window.partitionBy("status_id")
      .orderBy(desc("match_score"), asc("fighter_name"))
    val bestMatch = statusChanges
      .join(broadcast(lookup), matchCond)
      .select(statusChanges("status_id"), col("fighter_name"),
        matchScore.as("match_score"))
      .withColumn("match_rank", row_number().over(bestW))
      .filter(col("match_rank") === 1)
      .select(col("status_id").as("m_status_id"), col("fighter_name"))

    // status_resolved (:249-259)
    val statusResolved = statusChanges
      .join(bestMatch, col("status_id") === col("m_status_id"), "left")
      .select(col("status_id"), col("change_date"), col("weight_category"),
        coalesce(col("fighter_name"), col("fighter_token")).as("fighter_full_name"),
        col("reason"))

    // reigns_with_status (:260-300): interval join (change within the reign
    // window) + name equality (full or last name), dedup to the earliest
    // status per reign via row_number
    val status = statusResolved.select(
      col("weight_category").as("s_category"), col("fighter_full_name"),
      col("change_date").as("status_end_date"), col("reason").as("status_end_reason"))
    val reignCond = col("s_category") === col("weight_category") &&
      (lower(col("fighter_full_name")) === lower(col("fighter")) ||
        lower(col("fighter_full_name")) === lower(lastName(col("fighter")))) &&
      col("status_end_date") >= col("start_date") &&
      (col("next_champion_date").isNull ||
        col("status_end_date") < col("next_champion_date"))
    val statusRankW = Window
      .partitionBy("weight_category", "fighter", "start_date")
      .orderBy(asc_nulls_last("status_end_date"))
    val reignsFinal = newChampionEvents
      .join(broadcast(status), reignCond, "left")
      .withColumn("status_rank", row_number().over(statusRankW))
      .filter(col("status_rank") === 1)
      .select(
        col("weight_category"), col("fighter"), col("start_date"),
        coalesce(col("status_end_date"), col("next_champion_date")).as("end_date"),
        when(col("status_end_date").isNotNull, col("status_end_reason"))
          .when(col("next_champion_date").isNotNull, lit("lost title"))
          .otherwise(lit(null).cast("string")).as("end_reason"))

    // final projection (:302-317)
    reignsFinal.select(
      col("weight_category"), col("fighter"),
      col("start_date").cast("date").as("start_date"),
      col("end_date").cast("date").as("end_date"),
      col("end_reason"),
      when(col("end_date").isNull, lit(null).cast("int"))
        .otherwise(datediff(col("end_date"), col("start_date"))).as("reign_days"),
      when(col("end_date").isNull, 1).otherwise(0).as("is_active"))
      .orderBy(desc_nulls_last("reign_days"), asc("weight_category"), asc("fighter"))
  }
}
