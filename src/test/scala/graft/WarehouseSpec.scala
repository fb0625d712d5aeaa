package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{MetabaseCards, Sources, Warehouse}

/** S5/S6 serving-layer tests: the full DAG registered as temp views, the 14
  * Metabase card queries run as Spark SQL over them, each compared against
  * the reference card SQL executed in DuckDB (goldens from
  * tools/gen_goldens.py).
  */
class WarehouseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def res(p: String): String = getClass.getResource(p).getPath

  lazy val views: Map[String, DataFrame] = {
    val v = Warehouse.registerViews(
      spark,
      Sources.readCsv(spark, res("/fixtures/dim_ufc_event_details.csv")),
      Sources.readCsv(spark, res("/fixtures/fact_ufc_fight_results.csv")),
      Sources.readCsv(spark, res("/fixtures/title_status_changes_outside_octagon.csv")))
    // pin the reference's current_date to the golden generation date
    graft.model.Analytics
      .totalChampDays(v("mv_title_reigns"),
        org.apache.spark.sql.functions.to_date(org.apache.spark.sql.functions.lit("2026-01-01")))
      .createOrReplaceTempView("mv_total_champ_days")
    v
  }

  private def normalize(df: DataFrame): Seq[String] =
    df.collect().toSeq.map { row =>
      row.toSeq.map {
        case null => "␀"
        case d: Double => BigDecimal(d).round(new java.math.MathContext(9)).toString
        case v => v.toString
      }.mkString("|")
    }.sorted

  test("all 28 views register and are queryable") {
    assert(views.size == 28)
    views.keys.foreach { alias =>
      // smoke: every registered view answers SQL (count may be 0 for
      // threshold-filtered models on the tiny fixture)
      spark.sql(s"SELECT * FROM $alias").count()
    }
  }

  MetabaseCards.all.zipWithIndex.foreach { case ((title, sql), i) =>
    test(s"card $i: $title") {
      views // force registration
      val actual = spark.sql(sql)
      val slug = title.toLowerCase.replaceAll("[^a-z0-9]+", "_")
        .replaceAll("^_+|_+$", "")
      val expected = spark.read
        .option("header", "true")
        .option("nullValue", "\\N")
        .schema(actual.schema)
        .csv(res(f"/goldens/card_$i%02d_$slug.csv"))
      assert(normalize(actual) == normalize(expected),
        s"card '$title' mismatch:\nexpected:\n${normalize(expected).mkString("\n")}\nactual:\n${normalize(actual).mkString("\n")}")

    }
  }
}
