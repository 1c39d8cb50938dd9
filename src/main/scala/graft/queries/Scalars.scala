package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, MapType, StringType}

/** Scalar function surface: string, date/time, math, conditional/null,
  * JSON, array, map, subqueries (SURVEY.md §2B Q22–Q29).
  *
  * Cross-engine determinism rules applied here:
  *  - No `round()` on doubles (Spark rounds the shortest decimal rendering,
  *    DuckDB rounds the binary value — they disagree on 2-dp ties).
  *  - Only IEEE-exact double ops (`abs/floor/ceil/sqrt/+,-,*,/`) or libm
  *    functions whose 1-ulp error is far below the 6-dp hash rounding.
  *  - Day-of-week via Spark `weekday` ≡ DuckDB `isodow - 1` (Monday=0).
  */
object Scalars {

  // decomposed: e+COMBINING ACUTE, A+COMBINING RING, s+COMBINING DOT
  // BELOW+DOT ABOVE; NFC composes these to U+00E9, U+00C5, U+1E69. A plain
  // (non-triple-quoted) literal so the backslash-u escapes are processed
  // without deprecation; both the Spark plan and the DuckDB SQL text embed
  // the identical decomposed code points.
  private val nfcSuffix = " cafe\u0301 A\u030a s\u0323\u0307"

  private val q29Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
      |  AND o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'BUILDING')
      |  AND EXISTS (SELECT 1 FROM customer c
      |              WHERE c.c_custkey = orders.o_custkey
      |                AND c.c_acctbal > 0)
      |ORDER BY o_orderkey""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q22_strings",
      (s, d) => {
        Tables(s, d, "part").select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          lower(col("p_brand")).as("lo_brand"),
          substring(col("p_name"), 1, 5).as("pfx"),
          length(col("p_name")).as("name_len"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("tagged"),
          regexp_replace(col("p_name"), lit(" "), lit("_")).as("snake"),
          col("p_name").like("%re%").as("has_re"),
          size(split(col("p_name"), " ")).as("n_words"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |  upper(p_name) AS up_name,
             |  lower(p_brand) AS lo_brand,
             |  substr(p_name, 1, 5) AS pfx,
             |  CAST(length(p_name) AS INT) AS name_len,
             |  trim('  ' || p_name || '  ') AS trimmed,
             |  p_brand || '#' || p_type AS tagged,
             |  replace(p_name, ' ', '_') AS snake,
             |  (p_name LIKE '%re%') AS has_re,
             |  CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Q22b — Unicode NFC normalization (native graft `nfc_normalize`
    // expression ≡ DuckDB `nfc_normalize`; Spark has no builtin). The
    // fixture text is ASCII, so each row is suffixed with decomposed
    // sequences — e+U+0301, A+U+030A, s+U+0323+U+0307 (the last also
    // exercises canonical reordering) — making composition observable:
    // char count shrinks, the changed flag flips, byte identity of the
    // composed forms is hash-checked. Per-row scalar work, no shuffle;
    // the already-NFC fast path (Normalizer.isNormalized) means an
    // ASCII-dominated corpus pays a scan, not a rewrite.
    Q("q22_normalize",
      (s, d) => {
        graft.functions.GraftFunctions.ensureRegistered(s)
        val raw = concat(substring(col("text"), 1, 32), lit(nfcSuffix))
        val norm = call_function("nfc_normalize", raw)
        Tables(s, d, "documents").select(
          col("doc_id"),
          norm.as("norm"),
          length(raw).as("n_chars_raw"),
          length(norm).as("n_chars_norm"),
          octet_length(norm).as("n_bytes_norm"),
          (raw =!= norm).as("changed"))
          .orderBy(col("doc_id"))
      },
      // the SQL text carries the same decomposed code points via nfcSuffix
      Some(s"""WITH raw AS (
              |  SELECT doc_id,
              |    substr(text, 1, 32) || '$nfcSuffix' AS r
              |  FROM documents)
             |SELECT doc_id,
             |  nfc_normalize(r) AS norm,
             |  CAST(length(r) AS INT) AS n_chars_raw,
             |  CAST(length(nfc_normalize(r)) AS INT) AS n_chars_norm,
             |  CAST(strlen(nfc_normalize(r)) AS INT) AS n_bytes_norm,
             |  (nfc_normalize(r) != r) AS changed
             |FROM raw ORDER BY doc_id""".stripMargin)),

    Q("q23_datetime",
      (s, d) => {
        Tables(s, d, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          weekday(col("o_orderdate")).as("dow"),
          datediff(lit("2000-01-01").cast("date"), to_date(col("o_orderdate")))
            .as("days_to_2k"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INT) AS y,
             |  CAST(month(o_orderdate) AS INT) AS m,
             |  CAST(day(o_orderdate) AS INT) AS dom,
             |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             |  CAST(isodow(o_orderdate) - 1 AS INT) AS dow,
             |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
             |    AS INT) AS days_to_2k
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("q24_math",
      (s, d) => {
        Tables(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_extendedprice") - 50000.0).as("ab"),
          ceil(col("l_extendedprice")).as("ce"),
          floor(col("l_extendedprice")).as("fl"),
          (col("l_linenumber") % 3).as("md"),
          pow(col("l_quantity"), 2.0).as("pw"),
          sqrt(col("l_quantity")).as("sq"),
          log(col("l_extendedprice")).as("lg"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  abs(l_extendedprice - 50000.0) AS ab,
             |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
             |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
             |  l_linenumber % 3 AS md,
             |  pow(l_quantity, 2.0) AS pw,
             |  sqrt(l_quantity) AS sq,
             |  ln(l_extendedprice) AS lg
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q25_conditional",
      (s, d) => {
        Tables(s, d, "orders").select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000.0, "big")
            .when(col("o_totalprice") > 100000.0, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("status_or_open"),
          least(col("o_totalprice"), lit(250000.0)).as("lo"),
          greatest(col("o_totalprice"), lit(250000.0)).as("hi"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_totalprice > 300000.0 THEN 'big'
             |       WHEN o_totalprice > 100000.0 THEN 'mid'
             |       ELSE 'small' END AS bucket,
             |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
             |  least(o_totalprice, 250000.0) AS lo,
             |  greatest(o_totalprice, 250000.0) AS hi
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("q26_json",
      (s, d) => {
        Tables(s, d, "events").select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  json_extract_string(props, '$.k') AS k_str,
             |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int
             |FROM events ORDER BY event_id""".stripMargin)),

    // head3 is projected as a string, not a raw array<float>: the driver's
    // pandas compare cannot sort/hash array cells. Elements go through
    // float→double→*1e6→floor→bigint — every step is IEEE-identical on both
    // engines, unlike float-to-string rendering (Spark shortest-decimal vs
    // DuckDB's own formatter).
    Q("q27_arrays",
      (s, d) => {
        Tables(s, d, "embeddings").select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast("double").as("e1"),
          array_join(
            transform(slice(col("embedding"), 1, 3),
              x => floor(x.cast("double") * 1000000d).cast("long").cast("string")),
            ",").as("head3"),
          array_contains(col("embedding"), element_at(col("embedding"), 1))
            .as("has_e1"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id,
             |  CAST(len(embedding) AS INT) AS dim,
             |  CAST(embedding[1] AS DOUBLE) AS e1,
             |  array_to_string(
             |    [CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
             |     FOR x IN embedding[1:3]], ',') AS head3,
             |  list_contains(embedding, embedding[1]) AS has_e1
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    Q("q28_map",
      (s, d) => {
        // parse the JSON once into a map column, then reference it — two
        // from_json copies in one projection measured 2x slower (the parse
        // is too expensive for Catalyst to inline-and-dedup reliably).
        Tables(s, d, "events")
          .select(col("event_id"),
            from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
          .select(
            col("event_id"),
            element_at(col("m"), "k").as("k_val"),
            size(map_keys(col("m"))).as("n_keys"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
             |  CAST(len(json_keys(props)) AS INT) AS n_keys
             |FROM events ORDER BY event_id""".stripMargin)),

    // Q28b — map ENTRY expansion (the generator half of the map surface):
    // explode(map) → one row per entry. Oracle: DuckDB has no json_each
    // table function, but unnest(json_keys(...)) in a subquery + keyed
    // json_extract_string reproduces the same (event_id, mkey, mval) rows.
    Q("q28_map_entries",
      (s, d) => {
        Tables(s, d, "events")
          .select(col("event_id"),
            from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
          .select(col("event_id"), explode(col("m")).as(Seq("mkey", "mval")))
          .orderBy(col("event_id"), col("mkey"))
      },
      Some("""SELECT event_id, k AS mkey,
             |  CAST(json_extract_string(props, '$.' || k) AS INT) AS mval
             |FROM (SELECT event_id, props, unnest(json_keys(props)) AS k
             |      FROM events)
             |ORDER BY event_id, mkey""".stripMargin)),

    // Identical ANSI SQL runs on both engines: scalar subquery, IN-subquery,
    // correlated EXISTS. Catalyst decorrelates; no manual rewriting.
    Q("q29_subqueries",
      (s, d) => {
        Tables.views(s, d)
        s.sql(q29Sql)
      },
      Some(q29Sql))
  )
}
