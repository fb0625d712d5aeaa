package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.UfcExprs._

/** Staging models (SURVEY §1.1): trim/cast/derive views over the raw text
  * tables. Pure functions raw → DataFrame; the DAG is the Scala call graph
  * (dbt ref() equivalent, SURVEY §2.9 D1).
  */
object Staging {

  /** stg_event_details (ufc/models/stg/stg_event_details.sql:1-41):
    * trimmed identity columns + the 4-format date ladder + event_year. */
  def stgEventDetails(rawEvents: DataFrame): DataFrame = {
    val src = rawEvents.select(
      trim(col("event")).as("event"),
      trim(col("url")).as("url"),
      trim(col("date")).as("event_date_raw"),
      trim(col("location")).as("location"))
    val eventDate = dateLadder(col("event_date_raw"))
    src.select(
      col("event"),
      col("url"),
      col("location"),
      eventDate.as("event_date"),
      year(eventDate).cast("int").as("event_year"))
  }

  /** stg_fight_results (ufc/models/stg/stg_fight_results.sql:1-56):
    * trims, bout/outcome split_part, winner derivation, method_group,
    * fight-time second/minute formulas with the position(':') guard. */
  def stgFightResults(rawResults: DataFrame): DataFrame = {
    val src = rawResults.select(
      trim(col("event")).as("event"),
      trim(col("bout")).as("bout"),
      trim(col("weightclass")).as("weightclass"),
      trim(col("method")).as("method"),
      nullif(trim(col("round")), lit("")).cast("int").as("round_number"),
      trim(col("time")).as("time"),
      trim(col("time_format")).as("time_format"),
      trim(col("url")).as("url"),
      split_part(trim(col("bout")), lit(" vs. "), lit(1)).as("fighter_1"),
      split_part(trim(col("bout")), lit(" vs. "), lit(2)).as("fighter_2"),
      split_part(trim(col("outcome")), lit("/"), lit(1)).as("outcome_1"),
      split_part(trim(col("outcome")), lit("/"), lit(2)).as("outcome_2"))

    val timeGuard = col("time").isNull || instr(col("time"), ":") === 0 ||
      col("round_number").isNull
    val fightSeconds = (col("round_number") - 1) * 300 +
      split_part(col("time"), lit(":"), lit(1)).cast("int") * 60 +
      split_part(col("time"), lit(":"), lit(2)).cast("int")

    src.select(
      col("event"), col("bout"), col("weightclass"), col("method"),
      col("round_number"), col("time"), col("time_format"), col("url"),
      col("fighter_1"), col("fighter_2"), col("outcome_1"), col("outcome_2"),
      when(upper(col("outcome_1")) === "W", col("fighter_1"))
        .when(upper(col("outcome_2")) === "W", col("fighter_2"))
        .otherwise(lit(null).cast("string")).as("winner"),
      methodGroup(col("method")).as("method_group"),
      when(timeGuard, lit(null).cast("int"))
        .otherwise(fightSeconds).as("fight_time_seconds"),
      when(timeGuard, lit(null).cast("double"))
        .otherwise(fightSeconds / lit(60.0)).as("fight_time_minutes"))
  }
}
