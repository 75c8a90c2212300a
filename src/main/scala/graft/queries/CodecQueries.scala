package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QDef
import graft.codec.CodecFunctions._
import graft.model.Tables

/** C01–C02: ordered-bytes codec parity (SURVEY.md §1.2/§4 —
  * OrderedBytes.java:297, types/Struct.java). The oracle cannot
  * reproduce graft's byte layout, so both queries check the codec's
  * *contract* instead: C01 proves `sort by encoded bytes ≡ sort by
  * values` (incl. a DESC component and composite concatenation), C02
  * proves `decode ∘ encode = id` on real data for every supported type.
  * Hash-equality of ranks/values against the plain-SQL oracle is
  * exactly the ordering/roundtrip guarantee.
  */
object CodecQueries {

  val defs: Seq[QDef] = Seq(
    QDef(
      "c01_ordered_key_sort",
      (s, dir) => {
        val o = Tables.load(s, s"$dir/orders.parquet")
        // Composite key: (priority ASC, totalprice DESC, orderkey ASC).
        // Global row_number is the point of the test (total-order
        // parity); the scale path for ordered output is
        // repartitionByRange on this same key (D11 analogue).
        val k = concat(
          ordered_encode(col("o_orderpriority")),
          ordered_encode(col("o_totalprice"), desc = true),
          ordered_encode(col("o_orderkey")))
        o.select(k.as("k"), col("o_orderpriority"),
            round(col("o_totalprice"), 4).as("price"), col("o_orderkey"))
          .withColumn("rank", row_number().over(Window.orderBy(col("k"))))
          .select("rank", "o_orderpriority", "price", "o_orderkey")
          .orderBy("rank")
      },
      Some("""SELECT row_number() OVER (ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey) AS rank,
             |       o_orderpriority, ROUND(o_totalprice, 4) AS price, o_orderkey
             |FROM orders ORDER BY rank""".stripMargin)
    ),
    QDef(
      "c02_codec_roundtrip",
      (s, dir) => {
        val l = Tables.load(s, s"$dir/lineitem.parquet")
        l.select(
            col("l_orderkey"), col("l_linenumber"),
            ordered_decode_long(ordered_encode(col("l_orderkey"))).as("dec_long"),
            round(ordered_decode_double(
              ordered_encode(col("l_extendedprice"), desc = true), desc = true), 4)
              .as("dec_double"),
            ordered_decode_string(ordered_encode(col("l_returnflag"))).as("dec_str"),
            round(ordered_decode_numeric(
              ordered_encode(col("l_quantity").cast(DecimalType(12, 2)))), 4)
              .as("dec_num"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |       l_orderkey AS dec_long,
             |       ROUND(l_extendedprice, 4) AS dec_double,
             |       l_returnflag AS dec_str,
             |       ROUND(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE), 4) AS dec_num
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    )
  )
}
