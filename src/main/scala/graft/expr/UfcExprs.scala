package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared scalar expressions for the UFC model DAG — each mirrors a
  * reference SQL idiom (file:line cited per function), translated
  * PG-regex → Java-regex per SURVEY §7.4.3 ([[:space:]] → \s, ('i') flag →
  * (?i) inline; Spark regexp_replace is replace-all like PG 'g').
  */
object UfcExprs {

  /** The reference's 4-format date ladder
    * (stg_event_details.sql:16-26, title_reigns.sql:188-198):
    * regex-guarded `to_date` over 'Mon DD, YYYY' | 'Month DD, YYYY' |
    * 'Mon YYYY' | 'Month YYYY', else null. try_to_date keeps ANSI mode from
    * throwing on the month-name ambiguity PG tolerates. */
  def dateLadder(raw: Column): Column =
    when(raw.rlike("^[A-Za-z]{3}\\s+[0-9]{1,2},\\s+[0-9]{4}$"),
      try_to_date(raw, "MMM d, yyyy"))
      .when(raw.rlike("^[A-Za-z]+\\s+[0-9]{1,2},\\s+[0-9]{4}$"),
        try_to_date(raw, "MMMM d, yyyy"))
      .when(raw.rlike("^[A-Za-z]{3}\\s+[0-9]{4}$"),
        try_to_date(raw, "MMM yyyy"))
      .when(raw.rlike("^[A-Za-z]+\\s+[0-9]{4}$"),
        try_to_date(raw, "MMMM yyyy"))
      .otherwise(lit(null).cast("date"))

  /** Weight-category normalizer for undisputed title rows
    * (title_reigns.sql:26-33): strip trailing "Title Bout", leading "UFC". */
  def weightCategory(weightclass: Column): Column =
    trim(regexp_replace(
      regexp_replace(weightclass, "(?i)\\s+Title Bout\\s*$", ""),
      "(?i)^UFC\\s+", ""))

  /** Full normalizer (fct_fights.sql:10-22, title_reigns.sql:60-72):
    * additionally strips leading "Interim". Strip order matters and is the
    * reference's: "Interim UFC Heavyweight Title Bout" keeps its "UFC "
    * prefix because ^UFC runs before ^Interim. */
  def weightCategoryFull(weightclass: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(weightclass, "(?i)\\s+Title Bout\\s*$", ""),
        "(?i)^UFC\\s+", ""),
      "(?i)^Interim\\s+", ""))

  /** Vacancy-table category normalizer (title_reigns.sql:164-171):
    * strip trailing "Championship", leading "UFC". */
  def championshipCategory(category: Column): Column =
    trim(regexp_replace(
      regexp_replace(category, "(?i)\\s+Championship\\s*$", ""),
      "(?i)^UFC\\s+", ""))

  /** Scraped-fighter-token cleaner (title_reigns.sql:172-184). NOTE
    * bug-for-bug parity: the reference writes '^Both\\s+' and
    * '[[:space:]]*\\(.*\\)[[:space:]]*' in standard-conforming SQL
    * strings, so PG receives a literal backslash in the pattern and neither
    * arm ever matches real names — they are no-ops. Only the third arm
    * ('[[:space:]]+retired[[:space:]]*$', a working POSIX class) fires. */
  def fighterToken(fighter: Column): Column =
    trim(regexp_replace(fighter, "(?i)\\s+retired\\s*$", ""))

  /** First word of a name (dim_fighter.sql:15 `split_part(name,' ',1)`). */
  def firstName(name: Column): Column = split_part(name, lit(" "), lit(1))

  /** Last word of a name (dim_fighter.sql:16-20
    * `split_part(name,' ',array_length(string_to_array(name,' '),1))`). */
  def lastName(name: Column): Column = element_at(split(name, " "), -1)

  /** No-op "normalizer" used by title_defenses.sql:24-31,
    * consecutive_title_defenses.sql:20-27 and multi_division_champs.sql:5-12:
    * those models write the patterns '\\s+Title Bout\\s*$' / '^UFC\\s+'
    * whose double backslash reaches PG literally (standard_conforming_
    * strings), so nothing is stripped and weight_category is the raw
    * weightclass. Reproduced bug-for-bug (verified against the reference
    * SQL executed in DuckDB — tools/gen_goldens.py). */
  def weightCategoryNoop(weightclass: Column): Column = trim(weightclass)

  /** Method grouping (stg_fight_results.sql:33-41). */
  def methodGroup(method: Column): Column =
    when(method.ilike("%KO%"), "KO/TKO")
      .when(method.ilike("%SUB%"), "Submission")
      .when(method.ilike("%DEC%"), "Decision")
      .otherwise("Other")

  /** Image-URL slug (ufc/macros/fighter_image_url.sql:1-15):
    * lower → non-alnum runs → '_' → strip edge '_' → host + .png. */
  def fighterImageUrl(name: Column, host: String = "http://localhost:8888/"): Column =
    concat(lit(host),
      regexp_replace(
        regexp_replace(lower(trim(name)), "[^a-z0-9]+", "_"),
        "^_+|_+$", ""),
      lit(".png"))
}
