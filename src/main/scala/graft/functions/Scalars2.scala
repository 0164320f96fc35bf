package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.QueryDef
import graft.sources.Tables

/** Second scalar-function wave (SURVEY §2.B B29-B32 breadth): padding /
  * translate / positional string ops, month-arithmetic dates, bit
  * manipulation, and positional/slicing array ops. Same rules as
  * [[Scalars]]: codegen'd built-ins, both-sides type alignment.
  */
object Scalars2 {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_scalar_string2",
      (s, dir) => {
        Tables.part(s, dir)
          .select(
            col("p_partkey"),
            lpad(col("p_brand"), 12, "*").as("padded_l"),
            rpad(col("p_brand"), 12, "*").as("padded_r"),
            translate(col("p_type"), "aeiou", "AEIOU").as("vowels_up"),
            reverse(col("p_brand")).as("rev"),
            repeat(col("p_brand"), 2).as("doubled"),
            instr(col("p_name"), " ").cast(LongType).as("first_space"),
            expr("left(p_name, 8)").as("head8"),
            expr("right(p_name, 4)").as("tail4"))
          .orderBy(col("p_partkey"))
      },
      Some(
        """SELECT p_partkey,
          |       lpad(p_brand, 12, '*') AS padded_l,
          |       rpad(p_brand, 12, '*') AS padded_r,
          |       translate(p_type, 'aeiou', 'AEIOU') AS vowels_up,
          |       reverse(p_brand) AS rev,
          |       repeat(p_brand, 2) AS doubled,
          |       instr(p_name, ' ') AS first_space,
          |       left(p_name, 8) AS head8,
          |       right(p_name, 4) AS tail4
          |FROM part ORDER BY p_partkey""".stripMargin)
    ),

    QueryDef(
      "q_scalar_date2",
      (s, dir) => {
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            add_months(col("o_orderdate"), 3).as("plus_3m"),
            dayofyear(col("o_orderdate")).cast(LongType).as("doy"),
            make_date(year(col("o_orderdate")), lit(12), lit(31)).as("year_end"),
            (to_date(col("o_orderdate")) === last_day(col("o_orderdate")))
              .as("is_month_end"))
          .orderBy(col("o_orderkey"))
      },
      Some(
        """SELECT o_orderkey,
          |       CAST(o_orderdate + to_months(3) AS DATE) AS plus_3m,
          |       dayofyear(o_orderdate) AS doy,
          |       make_date(year(o_orderdate), 12, 31) AS year_end,
          |       CAST(o_orderdate AS DATE) = last_day(CAST(o_orderdate AS DATE))
          |         AS is_month_end
          |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),

    // B32(c) — predicate higher-order functions over arrays.
    QueryDef(
      "q_scalar_hof_pred",
      (s, dir) => {
        Tables.embeddings(s, dir)
          .select(
            col("vec_id"),
            exists(col("embedding"), x => x > 0.2f).as("any_big"),
            forall(col("embedding"), x => abs(x) < lit(1.0f)).as("all_unit"),
            size(filter(col("embedding"), (x, i) => i % 2 === 0 && x > 0.0f))
              .cast(LongType).as("n_pos_even_idx"))
          .orderBy(col("vec_id"))
      },
      Some(
        """SELECT vec_id,
          |       len(list_filter(embedding, x -> x > 0.2)) > 0 AS any_big,
          |       len(list_filter(embedding, x -> abs(x) < 1.0)) = len(embedding) AS all_unit,
          |       len(list_filter(embedding, (x, i) -> (i - 1) % 2 = 0 AND x > 0.0))
          |         AS n_pos_even_idx
          |FROM embeddings ORDER BY vec_id""".stripMargin)
    ),

    // Deterministic ~10% sampling keyed on the row identity, not a
    // partition-seeded RNG: `(key mod N) = slot` yields the SAME sample
    // for any cluster size, partition layout, or engine — the property a
    // training-data pipeline needs for reproducible held-out splits.
    // Replayable in plain SQL, so it carries a full hash oracle
    // (`.sample()`'s RNG stream, by contrast, is Spark-internal).
    QueryDef(
      "q_sample",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .filter(pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(10)) === 3)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some(
        """SELECT l_orderkey, l_linenumber, l_quantity
          |FROM lineitem
          |WHERE (l_orderkey * 7 + l_linenumber) % 10 = 3
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    QueryDef(
      "q_scalar_bits",
      (s, dir) => {
        Tables.events(s, dir)
          .select(
            col("event_id"),
            col("event_id").bitwiseAND(lit(0xFFL)).as("low8"),
            col("event_id").bitwiseOR(lit(0x100L)).as("with_bit9"),
            col("event_id").bitwiseXOR(col("user_id")).as("xored"),
            shiftleft(col("event_id"), 3).as("shl3"),
            shiftright(col("event_id"), 2).as("shr2"),
            bit_count(col("event_id")).cast(LongType).as("popcount"))
          .orderBy(col("event_id"))
      },
      Some(
        """SELECT event_id,
          |       event_id & 255 AS low8,
          |       event_id | 256 AS with_bit9,
          |       xor(event_id, user_id) AS xored,
          |       event_id << 3 AS shl3,
          |       event_id >> 2 AS shr2,
          |       CAST(bit_count(event_id) AS BIGINT) AS popcount
          |FROM events ORDER BY event_id""".stripMargin)
    ),

    QueryDef(
      "q_scalar_array2",
      (s, dir) => {
        val lbl = col("label").cast(LongType)
        Tables.embeddings(s, dir)
          .select(
            col("vec_id"),
            sequence(lit(1L), lbl + 1L).as("seq_arr"),
            array_position(sequence(lit(1L), lit(10L)), lbl + 1L).as("pos_in_10"),
            flatten(array(sequence(lit(1L), lbl + 1L),
              sequence(lit(1L), lit(2L)))).as("flat"),
            slice(sequence(lit(1L), lit(10L)), 2, 3).as("sliced"),
            array_repeat(lbl, 3).as("repeated"))
          .select(
            col("vec_id"),
            concat_ws(",", col("seq_arr")).as("seq_str"),
            col("pos_in_10"),
            concat_ws(",", col("flat")).as("flat_str"),
            concat_ws(",", col("sliced")).as("sliced_str"),
            concat_ws(",", col("repeated")).as("repeated_str"))
          .orderBy(col("vec_id"))
      },
      Some(
        """SELECT vec_id,
          |       array_to_string(generate_series(1, label + 1), ',') AS seq_str,
          |       CAST(coalesce(list_position(generate_series(1, 10), label + 1), 0) AS BIGINT) AS pos_in_10,
          |       array_to_string(flatten([generate_series(1, label + 1),
          |                                generate_series(1, 2)]), ',') AS flat_str,
          |       array_to_string(generate_series(1, 10)[2:4], ',') AS sliced_str,
          |       array_to_string([label, label, label], ',') AS repeated_str
          |FROM embeddings ORDER BY vec_id""".stripMargin)
    )
  )
}
