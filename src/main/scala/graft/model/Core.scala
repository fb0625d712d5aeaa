package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.UfcExprs._

/** Core semantic models (schema `semantic` in the reference). */
object Core {

  /** fct_fights (ufc/models/core/fct_fights.sql:1-73): results LEFT JOIN
    * events on event name (J1 — the dim side is broadcast-sized), full
    * weight-category normalization, title/interim/tournament flags. */
  def fctFights(stgFightResults: DataFrame, stgEventDetails: DataFrame): DataFrame = {
    val results = stgFightResults
    val events = stgEventDetails.select(col("event"), col("event_date"))
    results
      .join(broadcast(events), Seq("event"), "left")
      .select(
        col("url").as("fight_id"),
        col("event").as("event_name"),
        col("event_date"),
        col("bout"),
        col("weightclass").as("weightclass_raw"),
        weightCategoryFull(col("weightclass")).as("weight_category"),
        col("fighter_1"), col("fighter_2"), col("winner"),
        col("method"), col("round_number"), col("time"), col("time_format"),
        col("method_group"), col("fight_time_seconds"), col("fight_time_minutes"),
        when(col("weightclass").ilike("%Title Bout%"), 1).otherwise(0).as("is_title_bout"),
        when(col("weightclass").ilike("%interim%"), 1).otherwise(0).as("is_interim"),
        when(col("weightclass").ilike("%tournament%"), 1).otherwise(0).as("is_tournament"))
      .filter(col("fight_id").isNotNull && col("fight_id") =!= "")
  }

  /** dim_event (ufc/models/core/dim_event.sql:1-12). */
  def dimEvent(stgEventDetails: DataFrame): DataFrame =
    stgEventDetails
      .filter(col("event").isNotNull && col("event") =!= "")
      .select(
        col("event").as("event_name"),
        col("event").as("event_key"),
        col("event_date"), col("event_year"), col("location"), col("url"))

  /** dim_fighter (ufc/models/core/dim_fighter.sql:1-27): the U1 unpivot of
    * fighter_1/fighter_2/winner → distinct fighters with first/last name. */
  def dimFighter(fctFights: DataFrame): DataFrame = {
    val f1 = fctFights.select(col("fighter_1").as("fighter_name"))
    val f2 = fctFights.select(col("fighter_2").as("fighter_name"))
    val w = fctFights.select(col("winner").as("fighter_name"))
    f1.unionByName(f2).unionByName(w)
      .filter(col("fighter_name").isNotNull && col("fighter_name") =!= "")
      .select(
        col("fighter_name"),
        firstName(col("fighter_name")).as("first_name"),
        lastName(col("fighter_name")).as("last_name"))
      .distinct()
  }

  /** dim_division (ufc/models/core/dim_division.sql:1-6). */
  def dimDivision(fctFights: DataFrame): DataFrame =
    fctFights
      .filter(col("weight_category").isNotNull && col("weight_category") =!= "")
      .select(col("weight_category").as("division_name"))
      .distinct()

  /** fct_title_reigns (ufc/models/core/fct_title_reigns.sql:1-12):
    * stable projection over the analytics reign reconstruction. */
  def fctTitleReigns(titleReigns: DataFrame): DataFrame =
    titleReigns.select("weight_category", "fighter", "start_date", "end_date",
      "end_reason", "reign_days", "is_active")
}
