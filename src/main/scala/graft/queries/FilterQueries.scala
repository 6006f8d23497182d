package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.filters.MetadataFilter

/** Metadata-filter DSL coverage (SURVEY §2.4 F1-F9) over the driver's
  * testdata. The `part` table is viewed through the Morphik metadata layout —
  * a `Map[String,String]` value map plus a parallel declared-type map — and
  * each query applies a JSON filter through [[MetadataFilter.compile]]. The
  * oracle states the same predicate in plain SQL over the raw columns, so a
  * pass proves the compiled composite (type-gated casts, array-awareness,
  * null semantics) reproduces the intended relational semantics.
  */
object FilterQueries {

  /** part viewed as a Morphik-style document table: dynamic metadata with
    * declared types (string/number/decimal/array). `tags` is a JSON-encoded
    * array (the reference stores arrays JSON-encoded in JSONB). */
  def metaView(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      map(
        lit("name"), col("p_name"),
        lit("brand"), col("p_brand"),
        lit("type"), col("p_type"),
        lit("size"), col("p_size").cast("string"),
        lit("retail"), col("p_retailprice").cast("string"),
        lit("tags"), to_json(split(col("p_name"), " "))
      ).as("metadata"),
      typedLit(Map(
        "name" -> "string", "brand" -> "string", "type" -> "string",
        "size" -> "number", "retail" -> "decimal", "tags" -> "array"
      )).as("metadata_types"))

  private def filtered(spark: SparkSession, dir: String, json: String): DataFrame = {
    val df = metaView(spark, dir)
    df.filter(MetadataFilter.compile(json, col("metadata"), col("metadata_types")))
      .select("p_partkey").orderBy("p_partkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f1_implicit_eq" -> ((s, d) => filtered(s, d, """{"brand": "Brand#13"}""")),
    "f2_and_range_contains" -> ((s, d) => filtered(s, d,
      """{"$and": [{"size": {"$gte": 10, "$lt": 30}}, {"type": {"$contains": "econ"}}]}""")),
    "f3_nor_in" -> ((s, d) => filtered(s, d,
      """{"$nor": [{"brand": {"$in": ["Brand#1", "Brand#2"]}}, {"size": {"$lt": 5}}]}""")),
    "f4_array_or_regex" -> ((s, d) => filtered(s, d,
      """{"$or": [{"tags": "ring"}, {"name": {"$regex": "^BLUE ", "$options": "i"}}]}""")),
    "f5_decimal_exists_ne" -> ((s, d) => filtered(s, d,
      """{"retail": {"$gt": 950.5}, "name": {"$exists": true}, "brand": {"$ne": "Brand#7"}}""")),
    "f6_not_nin_type" -> ((s, d) => filtered(s, d,
      """{"$not": {"type": {"$nin": ["SMALL", "PROMO"]}}, "size": {"$type": "number"}}""")),
    // numeric-STRING operands (round-11 reference alignment,
    // `metadata_filters.py:537-560`: str operands parse to Decimal and hit
    // the number/decimal branches — "99.99"-style filters from JSON
    // clients must compare numerically, not lexically)
    "f7_numeric_string_cmp" -> ((s, d) => filtered(s, d,
      """{"retail": {"$gte": "950.50", "$lt": "1200"}, "size": {"$ne": "25.0"}}"""))
  )

  def oracles: Map[String, String] = Map(
    "f1_implicit_eq" ->
      "SELECT p_partkey FROM part WHERE p_brand = 'Brand#13' ORDER BY p_partkey",
    "f2_and_range_contains" ->
      """SELECT p_partkey FROM part
        |WHERE p_size >= 10 AND p_size < 30 AND p_type ILIKE '%econ%'
        |ORDER BY p_partkey""".stripMargin,
    "f3_nor_in" ->
      """SELECT p_partkey FROM part
        |WHERE NOT (p_brand IN ('Brand#1','Brand#2') OR p_size < 5)
        |ORDER BY p_partkey""".stripMargin,
    "f4_array_or_regex" ->
      """SELECT p_partkey FROM part
        |WHERE list_contains(string_split(p_name, ' '), 'ring')
        |   OR regexp_matches(p_name, '(?i)^BLUE ')
        |ORDER BY p_partkey""".stripMargin,
    "f5_decimal_exists_ne" ->
      """SELECT p_partkey FROM part
        |WHERE p_retailprice > 950.5 AND p_brand <> 'Brand#7'
        |ORDER BY p_partkey""".stripMargin,
    "f6_not_nin_type" ->
      """SELECT p_partkey FROM part
        |WHERE NOT (p_type NOT IN ('SMALL','PROMO'))
        |ORDER BY p_partkey""".stripMargin,
    "f7_numeric_string_cmp" ->
      """SELECT p_partkey FROM part
        |WHERE p_retailprice >= 950.50 AND p_retailprice < 1200
        |  AND p_size <> 25
        |ORDER BY p_partkey""".stripMargin
  )
}
