package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The serving layer (SURVEY §2.1 S5/S6): build the whole model DAG,
  * register every model under its reference view alias, and expose the 14
  * Metabase card queries as Spark SQL over those views — the dashboard hot
  * path of SURVEY §3.2 (view chain inlined by the optimizer per query, no
  * materialization, exactly like the reference's Postgres views; `.cache()`
  * on hot models is the one optional materialization decision, SURVEY §4).
  */
object Warehouse {

  /** Build every model; keys are the reference view aliases
    * (each model's `config(alias=...)`). */
  def buildAll(rawEvents: DataFrame, rawResults: DataFrame,
      rawVacancies: DataFrame): Map[String, DataFrame] = {
    val stgEvents = Staging.stgEventDetails(rawEvents)
    val stgResults = Staging.stgFightResults(rawResults)
    val fights = Core.fctFights(stgResults, stgEvents)
    val reigns = Analytics.titleReigns(stgResults, stgEvents, rawVacancies)
    val tFights = Analytics.titleFights(stgResults, stgEvents)
    val woc = Analytics.winsOverChampions(stgResults, stgEvents)
    Map(
      "mv_stg_event_details" -> stgEvents,
      "mv_stg_fight_results" -> stgResults,
      "fct_fights" -> fights,
      "dim_event" -> Core.dimEvent(stgEvents),
      "dim_fighter" -> Core.dimFighter(fights),
      "dim_division" -> Core.dimDivision(fights),
      "fct_title_reigns" -> Core.fctTitleReigns(reigns),
      "mv_title_reigns" -> reigns,
      "mv_title_fights" -> tFights,
      "mv_fighters_by_wins" -> Analytics.fightersByWins(stgResults),
      "mv_fighters_by_ko_wins" -> Analytics.fightersByKoWins(stgResults),
      "mv_fighters_by_submission_wins" -> Analytics.fightersBySubmissionWins(stgResults),
      "mv_fighters_by_non_decision_wins" -> Analytics.fightersByNonDecisionWins(stgResults),
      "mv_fight_time_per_division" -> Analytics.fightTimePerDivision(stgResults),
      "mv_fighters_best_record_min_10_fights" -> Analytics.fightersBestRecord(stgResults),
      "mv_fightrers_by_avg_fight_time_min_5" -> Analytics.fightersByAvgFightTime(stgResults),
      "mv_clutch_wins_min_10_fights" -> Analytics.clutchWins(stgResults),
      "mv_championship_rounds_fought" -> Analytics.championshipRoundsFought(stgResults),
      "mv_title_fight_results_by_fighter" -> Analytics.titleFightResultsByFighter(stgResults),
      "mv_title_defenses" -> Analytics.titleDefenses(stgResults, stgEvents),
      "mv_dominant_style_per_division_year" ->
        Analytics.dominantStylePerDivisionYear(stgResults, stgEvents),
      "mv_fighters_by_longest_winning_streak" ->
        Analytics.fightersByLongestWinningStreak(stgResults, stgEvents),
      "mv_consecutive_title_defenses" ->
        Analytics.consecutiveTitleDefenses(stgResults, stgEvents),
      "mv_quality_of_opposition_faced" ->
        Analytics.qualityOfOppositionFaced(stgResults, stgEvents),
      "mv_wins_over_champions" -> woc,
      "mv_wins_over_champions_agg" -> Analytics.winsOverChampionsAgg(woc),
      "mv_multiple_weight_class_champs" -> Analytics.multiDivisionChamps(tFights),
      "mv_total_champ_days" -> Analytics.totalChampDays(reigns))
  }

  /** S5 view materialization: `createOrReplaceTempView` per model (the
    * Spark equivalent of dbt's CREATE VIEW DDL — no data moves). */
  def registerViews(spark: SparkSession, rawEvents: DataFrame,
      rawResults: DataFrame, rawVacancies: DataFrame): Map[String, DataFrame] = {
    val all = buildAll(rawEvents, rawResults, rawVacancies)
    all.foreach { case (alias, df) => df.createOrReplaceTempView(alias) }
    all
  }
}

/** The 14 Metabase dashboard cards (metabase/charts.sh:154-498) as Spark
  * SQL over the registered views. Translation notes: the schema prefix
  * (`fighters_extracted_goat_status.`) drops (temp views are schemaless),
  * and PG's 4-arg `regexp_replace(..., 'g')` becomes Spark's 3-arg form
  * (replace-all is Spark's default).
  */
object MetabaseCards {

  /** The shared fighter-image-URL column (charts.sh:157-169, the inlined
    * fighter_image_url macro). */
  private val imgUrl: String =
    """case
      |    when fighter is null or fighter = '' then null
      |    else concat(
      |      'http://localhost:8888/',
      |      regexp_replace(
      |        regexp_replace(lower(fighter), '[^a-z0-9]+', '_'),
      |        '^_+|_+$',
      |        ''
      |      ),
      |      '.png'
      |    )
      |  end as fighter_image_url""".stripMargin

  private def card(cols: String, table: String, tail: String): String =
    s"SELECT\n  fighter,\n  $imgUrl${if (cols.isEmpty) "" else s",\n  $cols"}\nFROM $table\n$tail"

  /** (card title, spark SQL) in charts.sh order. */
  val all: Seq[(String, String)] = Seq(
    "Quality of Opposition (At Time) - Top 25" -> card(
      "avg_opponent_win_pct_at_time", "mv_quality_of_opposition_faced",
      "ORDER BY avg_opponent_win_pct_at_time DESC NULLS LAST\nLIMIT 25"),
    "Quality of Opposition (Career Wins) - Top 25" -> card(
      "avg_opponent_career_wins", "mv_quality_of_opposition_faced",
      "ORDER BY avg_opponent_career_wins DESC NULLS LAST\nLIMIT 25"),
    "Title Fight Wins by Fighter and Category" -> card(
      "category,\n  title_fight_wins", "mv_title_fight_results_by_fighter",
      "WHERE title_fight_wins > 0\nORDER BY title_fight_wins DESC\nLIMIT 50"),
    "Multiple Division Champs" -> card(
      "distinct_title_categories", "mv_multiple_weight_class_champs",
      "ORDER BY distinct_title_categories DESC, total_title_wins DESC"),
    "Wins Over Champions (Distinct Opponents)" -> card(
      "wins_over_champions", "mv_wins_over_champions_agg",
      "ORDER BY wins_over_champions DESC\nLIMIT 25"),
    "Longest Winning Streaks (10+)" -> card(
      "longest_win_streak", "mv_fighters_by_longest_winning_streak",
      "ORDER BY longest_win_streak DESC\nLIMIT 25"),
    "Best Records (Min 10 Fights)" -> card(
      "win_pct", "mv_fighters_best_record_min_10_fights",
      "ORDER BY win_pct DESC\nLIMIT 25"),
    "Non-Decision Wins" -> card(
      "non_decision_wins", "mv_fighters_by_non_decision_wins",
      "ORDER BY non_decision_wins DESC\nLIMIT 25"),
    "Title Defenses by Category" -> card(
      "weight_category,\n  title_defenses", "mv_title_defenses",
      "ORDER BY title_defenses DESC\nLIMIT 50"),
    "Championship Rounds Fought (Min 5 Title Fights)" -> card(
      "title_fights,\n  championship_rounds_fought", "mv_championship_rounds_fought",
      "ORDER BY championship_rounds_fought DESC, title_fights DESC, fighter\nLIMIT 50"),
    "Consecutive Title Defenses by Category" -> card(
      "weight_category,\n  max_consecutive_title_defenses", "mv_consecutive_title_defenses",
      "ORDER BY max_consecutive_title_defenses DESC, fighter, weight_category\nLIMIT 50"),
    "Clutch Wins (Min 10 Fights)" -> card(
      "clutch_wins", "mv_clutch_wins_min_10_fights",
      "ORDER BY clutch_wins DESC\nLIMIT 25"),
    "Total Champ Days by Category" -> card(
      "weight_category,\n  total_champ_days", "mv_total_champ_days",
      "ORDER BY total_champ_days DESC NULLS LAST, fighter, weight_category\nLIMIT 50"),
    "Title Reigns" -> card(
      "weight_category,\n  start_date,\n  end_date,\n  end_reason,\n  reign_days,\n  is_active",
      "mv_title_reigns",
      "ORDER BY reign_days DESC NULLS LAST, fighter, weight_category\nLIMIT 200"))

  /** Run every card (S6 BI read path). */
  def runAll(spark: SparkSession): Seq[(String, DataFrame)] =
    all.map { case (name, sql) => name -> spark.sql(sql) }
}
