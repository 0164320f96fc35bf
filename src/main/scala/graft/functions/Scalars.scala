package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, MapType, StringType}
import graft.QueryDef
import graft.sources.Tables

/** Scalar-function surface (SURVEY §2.B B29-B35) — all codegen'd
  * built-ins, no UDFs (those live in [[Extensions]] as explicit
  * extension-point exemplars).
  *
  * Numeric note: transcendental outputs (ln/exp) are rounded on both
  * sides — JVM libm and DuckDB's C libm may differ in the last ULP.
  * Array folds cast elements to double *before* folding so both engines
  * run the identical IEEE op sequence.
  */
object Scalars {

  val defs: Seq[QueryDef] = Seq(

    // B29 — string family over `part`.
    QueryDef(
      "q_scalar_string",
      (s, dir) => {
        Tables.part(s, dir)
          .select(
            col("p_partkey"),
            lower(col("p_name")).as("lo_name"),
            upper(col("p_brand")).as("up_brand"),
            trim(concat(lit("  "), col("p_type"), lit(" "))).as("trimmed"),
            substring(col("p_type"), 1, 5).as("type5"),
            split(col("p_name"), " ").getItem(0).as("first_word"),
            regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
            levenshtein(col("p_brand"), lit("Brand#13")).cast(LongType).as("lev"),
            concat_ws("|", col("p_brand"), col("p_type")).as("joined"))
          .orderBy(col("p_partkey"))
      },
      Some(
        """SELECT p_partkey,
          |       lower(p_name) AS lo_name,
          |       upper(p_brand) AS up_brand,
          |       trim('  ' || p_type || ' ') AS trimmed,
          |       substring(p_type, 1, 5) AS type5,
          |       string_split(p_name, ' ')[1] AS first_word,
          |       regexp_extract(p_type, '^(\w+)', 1) AS type_head,
          |       levenshtein(p_brand, 'Brand#13') AS lev,
          |       concat_ws('|', p_brand, p_type) AS joined
          |FROM part ORDER BY p_partkey""".stripMargin)
    ),

    // B30 — date/time family over `orders` (timestamp[ms] — µs-safe).
    QueryDef(
      "q_scalar_date",
      (s, dir) => {
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            // DuckDB's date_trunc('month') yields DATE; align types
            date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
            date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"),
            quarter(col("o_orderdate")).cast(LongType).as("qtr"),
            weekofyear(col("o_orderdate")).cast(LongType).as("iso_week"),
            dayofweek(col("o_orderdate")).cast(LongType).as("dow_1sun"),
            last_day(col("o_orderdate")).as("month_end"),
            datediff(to_date(col("o_orderdate")), lit("1995-01-01"))
              .cast(LongType).as("days_since_95"))
          .orderBy(col("o_orderkey"))
      },
      Some(
        """SELECT o_orderkey,
          |       date_trunc('month', o_orderdate) AS month_start,
          |       strftime(o_orderdate, '%Y-%m') AS ym,
          |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
          |       quarter(o_orderdate) AS qtr,
          |       weekofyear(o_orderdate) AS iso_week,
          |       dayofweek(o_orderdate) + 1 AS dow_1sun,
          |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
          |       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
          |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),

    // B31 — math family over `lineitem`.
    QueryDef(
      "q_scalar_math",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice"), 1).as("price_r1"),
            abs(col("l_discount") - lit(0.05)).as("disc_dev"),
            round(log(col("l_extendedprice")), 6).as("ln_price"),
            round(exp(col("l_discount")), 6).as("exp_disc"),
            pow(col("l_quantity"), 2).as("qty_sq"),
            sqrt(col("l_quantity")).as("qty_sqrt"),
            ceil(col("l_tax") * 100).cast(LongType).as("tax_pct_ceil"),
            floor(col("l_tax") * 100).cast(LongType).as("tax_pct_floor"),
            greatest(col("l_tax"), col("l_discount")).as("max_rate"),
            least(col("l_tax"), col("l_discount")).as("min_rate"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some(
        """SELECT l_orderkey, l_linenumber,
          |       round(l_extendedprice, 1) AS price_r1,
          |       abs(l_discount - 0.05) AS disc_dev,
          |       round(ln(l_extendedprice), 6) AS ln_price,
          |       round(exp(l_discount), 6) AS exp_disc,
          |       pow(l_quantity, 2) AS qty_sq,
          |       sqrt(l_quantity) AS qty_sqrt,
          |       CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
          |       CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
          |       greatest(l_tax, l_discount) AS max_rate,
          |       least(l_tax, l_discount) AS min_rate
          |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    // B32 — array + higher-order functions over `embeddings.embedding`.
    QueryDef(
      "q_scalar_array",
      (s, dir) => {
        Tables.embeddings(s, dir)
          .select(
            col("vec_id"),
            size(col("embedding")).cast(LongType).as("dim"),
            element_at(col("embedding"), 1).as("e1"),
            array_min(col("embedding")).as("e_min"),
            array_max(col("embedding")).as("e_max"),
            round(aggregate(
              transform(col("embedding"), x => x.cast(DoubleType)),
              lit(0.0), (acc, x) => acc + x), 6).as("e_sum"),
            round(aggregate(
              transform(col("embedding"), x => {
                val d = x.cast(DoubleType); d * d
              }),
              lit(0.0), (acc, x) => acc + x), 6).as("e_sumsq"),
            size(filter(col("embedding"), x => x > 0.0f)).cast(LongType).as("n_pos"))
          .orderBy(col("vec_id"))
      },
      Some(
        """SELECT vec_id,
          |       len(embedding) AS dim,
          |       embedding[1] AS e1,
          |       list_aggregate(embedding, 'min') AS e_min,
          |       list_aggregate(embedding, 'max') AS e_max,
          |       round(list_sum(list_transform(embedding,
          |             x -> CAST(x AS DOUBLE))), 6) AS e_sum,
          |       round(list_sum(list_transform(embedding,
          |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS e_sumsq,
          |       len(list_filter(embedding, x -> x > 0)) AS n_pos
          |FROM embeddings ORDER BY vec_id""".stripMargin)
    ),

    // B33 — map functions (map built from the embedded JSON, B34).
    QueryDef(
      "q_scalar_map",
      (s, dir) => {
        val m = from_json(col("props"), MapType(StringType, IntegerType))
        Tables.events(s, dir)
          .select(
            col("event_id"),
            array_join(map_keys(m), ",").as("keys"),
            element_at(m, "k").as("k_val"),
            size(map_values(m)).cast(LongType).as("n_vals"))
          .orderBy(col("event_id"))
      },
      Some(
        """SELECT event_id,
          |       array_to_string(json_keys(props), ',') AS keys,
          |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
          |       len(json_keys(props)) AS n_vals
          |FROM events ORDER BY event_id""".stripMargin)
    )
  )
}
