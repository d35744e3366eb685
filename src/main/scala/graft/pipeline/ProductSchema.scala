package graft.pipeline

import org.apache.spark.sql.types._

/** The product record schema — the reference's de-facto schema contract,
  * defined in its extraction prompt (reference
  * `vision_parser/pnp-vision-parserLambda.py:66-81`) and conformed by its
  * cleaner (`data_cleaner/pnp-cleanerLambda.py:77-103`). SURVEY §1.2 maps
  * each column to the Spark type used here.
  *
  * `weight_volume` is read as StringType directly: the JSON parser keeps the
  * literal token text, so an integer 550 stays "550" and a float 550.0 stays
  * "550.0" — byte-identical to the reference's pandas `astype(str)` artifact
  * (`pnp-cleanerLambda.py:92`), without a lossy double round-trip.
  */
object ProductSchema {

  /** The 10 columns every silver-zone product object must conform to
    * (`pnp-cleanerLambda.py:77-85`).
    */
  val expectedColumns: Seq[String] = Seq(
    "product_name", "brand", "current_price", "was_price",
    "weight_volume", "unit", "deal_type", "multi_buy_quantity",
    "bounding_box", "group_id")

  /** Silver-zone read schema: permissive JSON read against this adds any
    * missing field as null — replacing the reference's column-by-column
    * conformance loop with one declarative scan.
    */
  val silver: StructType = StructType(Seq(
    StructField("product_name", StringType),
    StructField("brand", StringType),
    // Prices stay DoubleType, NOT DecimalType(10,2): the extractor emits
    // JSON numbers and the whole verification chain (DuckDB read_json
    // DOUBLE columns → pandas float64 row hashing) compares binary-equal
    // doubles, so Double is what keeps the oracle exact here. A production
    // 100 TB deployment exposed to currency arithmetic (sums across
    // billions of rows, tax/discount chains) should switch these two
    // fields to DecimalType(10,2) — exact accumulation, no float drift —
    // at the cost of ~2x agg width; the engine code is type-agnostic
    // (no float-specific ops on prices outside round()).
    StructField("current_price", DoubleType),
    StructField("was_price", DoubleType),
    StructField("weight_volume", StringType),
    StructField("unit", StringType),
    StructField("deal_type", StringType),
    StructField("multi_buy_quantity", IntegerType),
    StructField("bounding_box", ArrayType(IntegerType)),
    StructField("group_id", StringType)))

  /** Name of the quarantine column capturing unparseable silver input
    * (SURVEY §7.4 item 6: conformance must be total — LLM garbage becomes
    * an inspectable row, never an error).
    */
  val CorruptColumn = "_corrupt_record"

  /** [[silver]] plus the corrupt-record capture column, the actual scan
    * schema of the silver zone.
    */
  val silverWithCorrupt: StructType =
    StructType(silver.fields :+ StructField(CorruptColumn, StringType))

  /** Clean-zone (gold) column order: the 10 conformed columns + partition
    * and lineage columns, fixed order (`pnp-cleanerLambda.py:103`).
    */
  val cleanColumns: Seq[String] =
    expectedColumns ++ Seq("province", "date_range", "source_file")

  /** Partition columns of the clean zone, "for Athena performance" in the
    * reference (`pnp-cleanerLambda.py:106,115`); here they drive parquet
    * partition pruning the same way.
    */
  val partitionColumns: Seq[String] = Seq("province", "date_range")
}
