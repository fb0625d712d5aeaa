package graft.queries

import org.apache.spark.sql.functions._

/** Scalar-function families (SURVEY.md §2.8 F1-F24) — string splitting,
  * the reference's 4-format regex-guarded date ladder, the image-URL slug
  * regexp chain, conditional/math expressions, and a JSON accessor. All
  * per-row, codegen'd, shuffle-free except the final presentation sort.
  */
object Scalars {

  /** F1/F2/F4/F5/F6/F10/F3: trim/case-folding, PG-semantics split_part
    * (returns '' past the last part, stg_fight_results.sql:13-16), last-word
    * extraction (dim_fighter.sql:16-20), position/instr, concat, nullif. */
  val fStrings = QueryDef(
    "q_f_string_ops",
    """SELECT p_partkey,
      |       split_part(p_name, ' ', 1) AS first_word,
      |       split_part(p_name, ' ', 5) AS fifth_word,
      |       string_split(p_name, ' ')[-1] AS last_word,
      |       upper(p_name) AS name_upper,
      |       lower(p_type) AS type_lower,
      |       CAST(instr(p_name, 'e') AS INT) AS e_pos,
      |       p_brand || ':' || p_type AS brand_type,
      |       nullif(trim(p_name), '') AS name_nonempty
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    T.part(s, d)
      .select(
        col("p_partkey"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
        split_part(col("p_name"), lit(" "), lit(5)).as("fifth_word"),
        element_at(split(col("p_name"), " "), -1).as("last_word"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_type")).as("type_lower"),
        instr(col("p_name"), "e").cast("int").as("e_pos"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        nullif(trim(col("p_name")), lit("")).as("name_nonempty"))
      .orderBy("p_partkey")
  }

  /** F11/F12/F8/F16: the reference's signature 4-format date ladder
    * (stg_event_details.sql:16-39) — multi-format raw date strings parsed
    * through regex guards + try_to_date coalesce, plus year extraction.
    * Raw strings are synthesized deterministically from o_orderdate (format
    * chosen by o_orderkey % 5; branch 4 is unparseable garbage). */
  val fDateLadder = QueryDef(
    "q_f_date_ladder",
    """WITH raw AS (
      |  SELECT o_orderkey,
      |         CASE CAST(o_orderkey % 5 AS INT)
      |           WHEN 0 THEN strftime(o_orderdate, '%b %-d, %Y')
      |           WHEN 1 THEN strftime(o_orderdate, '%B %-d, %Y')
      |           WHEN 2 THEN strftime(o_orderdate, '%b %Y')
      |           WHEN 3 THEN strftime(o_orderdate, '%B %Y')
      |           ELSE 'not a date'
      |         END AS date_raw
      |  FROM orders
      |)
      |SELECT o_orderkey, date_raw,
      |       CASE
      |         WHEN regexp_matches(date_raw, '^[A-Za-z]{3}\s+[0-9]{1,2},\s+[0-9]{4}$')
      |           THEN CAST(try_strptime(date_raw, '%b %d, %Y') AS DATE)
      |         WHEN regexp_matches(date_raw, '^[A-Za-z]+\s+[0-9]{1,2},\s+[0-9]{4}$')
      |           THEN CAST(try_strptime(date_raw, '%B %d, %Y') AS DATE)
      |         WHEN regexp_matches(date_raw, '^[A-Za-z]{3}\s+[0-9]{4}$')
      |           THEN CAST(try_strptime(date_raw, '%b %Y') AS DATE)
      |         WHEN regexp_matches(date_raw, '^[A-Za-z]+\s+[0-9]{4}$')
      |           THEN CAST(try_strptime(date_raw, '%B %Y') AS DATE)
      |         ELSE NULL
      |       END AS parsed_date,
      |       CAST(year(CASE
      |         WHEN regexp_matches(date_raw, '^[A-Za-z]{3}\s+[0-9]{1,2},\s+[0-9]{4}$')
      |           THEN CAST(try_strptime(date_raw, '%b %d, %Y') AS DATE)
      |         WHEN regexp_matches(date_raw, '^[A-Za-z]+\s+[0-9]{1,2},\s+[0-9]{4}$')
      |           THEN CAST(try_strptime(date_raw, '%B %d, %Y') AS DATE)
      |         WHEN regexp_matches(date_raw, '^[A-Za-z]{3}\s+[0-9]{4}$')
      |           THEN CAST(try_strptime(date_raw, '%b %Y') AS DATE)
      |         WHEN regexp_matches(date_raw, '^[A-Za-z]+\s+[0-9]{4}$')
      |           THEN CAST(try_strptime(date_raw, '%B %Y') AS DATE)
      |         ELSE NULL
      |       END) AS INT) AS parsed_year
      |FROM raw
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val raw = T.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 5 === 0, date_format(col("o_orderdate"), "MMM d, yyyy"))
        .when(col("o_orderkey") % 5 === 1, date_format(col("o_orderdate"), "MMMM d, yyyy"))
        .when(col("o_orderkey") % 5 === 2, date_format(col("o_orderdate"), "MMM yyyy"))
        .when(col("o_orderkey") % 5 === 3, date_format(col("o_orderdate"), "MMMM yyyy"))
        .otherwise(lit("not a date")).as("date_raw"))
    // the reference's ladder verbatim: regex guard per format, else null
    // (POSIX [[:space:]] → \s, per SURVEY §7.4.3)
    val parsed =
      when(col("date_raw").rlike("^[A-Za-z]{3}\\s+[0-9]{1,2},\\s+[0-9]{4}$"),
        try_to_date(col("date_raw"), "MMM d, yyyy"))
        .when(col("date_raw").rlike("^[A-Za-z]+\\s+[0-9]{1,2},\\s+[0-9]{4}$"),
          try_to_date(col("date_raw"), "MMMM d, yyyy"))
        .when(col("date_raw").rlike("^[A-Za-z]{3}\\s+[0-9]{4}$"),
          try_to_date(col("date_raw"), "MMM yyyy"))
        .when(col("date_raw").rlike("^[A-Za-z]+\\s+[0-9]{4}$"),
          try_to_date(col("date_raw"), "MMMM yyyy"))
        .otherwise(lit(null).cast("date"))
    raw.select(col("o_orderkey"), col("date_raw"), parsed.as("parsed_date"),
        year(parsed).cast("int").as("parsed_year"))
      .orderBy("o_orderkey")
  }

  /** F7/F24: the image-URL slug chain (ufc/macros/fighter_image_url.sql:1-15,
    * inlined 14× in metabase/charts.sh): lower → non-alnum runs → '_' →
    * strip leading/trailing '_' → concat host + extension. Spark
    * regexp_replace replaces all matches (= PG/DuckDB 'g' flag). */
  val fRegexSlug = QueryDef(
    "q_f_regex_slug",
    """SELECT p_partkey,
      |       'http://img.local/' ||
      |       regexp_replace(regexp_replace(lower(trim(p_name)), '[^a-z0-9]+', '_', 'g'),
      |                      '^_+|_+$', '', 'g')
      |       || '.png' AS image_url
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val slug = regexp_replace(
      regexp_replace(lower(trim(col("p_name"))), "[^a-z0-9]+", "_"),
      "^_+|_+$", "")
    T.part(s, d)
      .select(col("p_partkey"),
        concat(lit("http://img.local/"), slug, lit(".png")).as("image_url"))
      .orderBy("p_partkey")
  }

  /** F16/F17/F19/F20: multi-arm CASE, greatest/least, coalesce, the
    * fight-time-seconds integer formula shape ((round-1)*300 + mm*60 + ss,
    * stg_fight_results.sql:44-49), and cast-then-divide true division. */
  val fCaseMath = QueryDef(
    "q_f_case_math",
    """SELECT l_orderkey, l_linenumber,
      |       CASE
      |         WHEN l_quantity <= 10 THEN 'small'
      |         WHEN l_quantity <= 30 THEN 'medium'
      |         WHEN l_quantity <= 45 THEN 'large'
      |         ELSE 'jumbo'
      |       END AS qty_band,
      |       greatest(CAST(l_quantity AS INT) - 1, 0) AS qty_minus_one,
      |       least(CAST(l_quantity AS INT), l_linenumber * 10) AS capped,
      |       (l_linenumber - 1) * 300 + CAST(l_quantity AS INT) * 60 AS synth_seconds,
      |       ((l_linenumber - 1) * 300 + CAST(l_quantity AS INT) * 60) / 60.0 AS synth_minutes,
      |       CAST(l_linenumber AS DOUBLE) / 7 AS frac
      |FROM lineitem
      |WHERE l_orderkey < 3000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val qtyInt = col("l_quantity").cast("int")
    val synthSeconds = (col("l_linenumber") - 1) * 300 + qtyInt * 60
    T.lineitem(s, d)
      .filter(col("l_orderkey") < 3000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") <= 10, "small")
          .when(col("l_quantity") <= 30, "medium")
          .when(col("l_quantity") <= 45, "large")
          .otherwise("jumbo").as("qty_band"),
        greatest(qtyInt - 1, lit(0)).as("qty_minus_one"),
        least(qtyInt, col("l_linenumber") * 10).as("capped"),
        synthSeconds.as("synth_seconds"),
        (synthSeconds / lit(60.0)).as("synth_minutes"),
        (col("l_linenumber").cast("double") / 7).as("frac"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** JSON accessor over events.props (beyond the reference's surface —
    * standard warehouse need). */
  val fJson = QueryDef(
    "q_f_json_extract",
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS INT) AS k_value
      |FROM events
      |WHERE event_id < 2000
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    T.events(s, d)
      .filter(col("event_id") < 2000)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_value"))
      .orderBy("event_id")
  }

  /** Array function surface: distinct / sort / element access / contains.
    * Spark's array_distinct keeps first-occurrence order while DuckDB's
    * list_distinct doesn't guarantee one — so every distinct passes
    * through a sort before any order-sensitive access; out-of-range access
    * uses try_element_at (ANSI mode throws on plain element_at, DuckDB
    * yields NULL). */
  val fArrayOps = QueryDef(
    "q_f_array_ops",
    """WITH w AS (
      |  SELECT doc_id,
      |         list_sort(list_distinct(
      |           list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                       x -> x <> ''))) AS ws
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(len(ws) AS INTEGER) AS n_distinct,
      |       ws[1] AS first_word,
      |       ws[30] AS word30,
      |       list_contains(ws, 'join') AS has_join
      |FROM w ORDER BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"),
        array_sort(array_distinct(
          filter(split(lower(trim(col("text"))), "\\s+"), x => x =!= ""))).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).as("n_distinct"),
        try_element_at(col("ws"), lit(1)).as("first_word"),
        try_element_at(col("ws"), lit(30)).as("word30"),
        array_contains(col("ws"), "join").as("has_join"))
      .orderBy("doc_id")
  }

  /** Higher-order function surface: transform / aggregate / filter /
    * exists — integer-only lambda bodies, so results are engine-exact.
    * (Hot paths use compiled kernels; this pins the composable API.) */
  val fHofOps = QueryDef(
    "q_f_hof_ops",
    """WITH w AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                     x -> x <> '') AS ws
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS total_chars,
      |       CAST(len(list_filter(ws, x -> length(x) > 4)) AS INTEGER) AS n_long,
      |       len(list_filter(ws, x -> x = 'vector')) > 0 AS has_vector
      |FROM w ORDER BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"),
        filter(split(lower(trim(col("text"))), "\\s+"), x => x =!= "").as("ws"))
      .select(col("doc_id"),
        aggregate(transform(col("ws"), x => length(x)), lit(0L),
          (acc, x) => acc + x).as("total_chars"),
        size(filter(col("ws"), x => length(x) > 4)).as("n_long"),
        exists(col("ws"), x => x === "vector").as("has_vector"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(fStrings, fDateLadder, fRegexSlug, fCaseMath,
    fJson, fArrayOps, fHofOps)
}
