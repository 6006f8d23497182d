package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.filters.MetadataFilter
import graft.filters.MetadataFilter.Ctx

/** Semantics goldens for the filter DSL, mirroring the reference's
  * `core/tests/unit/test_metadata_filters.py` cases: typed comparisons,
  * null/missing-key handling, array-awareness, regex/contains, $exists,
  * $type aliases, reserved-column null-safe ops. */
class MetadataFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  /** id, metadata, metadata_types, filename. */
  lazy val docs: DataFrame = {
    val rows = Seq(
      // typed number/decimal/datetime/date/bool/array/object
      (1, Map("year" -> "2024", "dept" -> "finance"),
        Map("year" -> "number", "dept" -> "string"), "a.pdf"),
      (2, Map("year" -> "2023", "dept" -> "eng"),
        Map("year" -> "number", "dept" -> "string"), "b.txt"),
      (3, Map("price" -> "19.99", "due" -> "2026-03-01T00:00:00Z"),
        Map("price" -> "decimal", "due" -> "datetime"), null),
      (4, Map("tags" -> """["a","b"]""", "flag" -> "true"),
        Map("tags" -> "array", "flag" -> "boolean"), "d.PDF"),
      (5, Map("year" -> "not-a-number", "dept" -> "Finance"),
        Map("year" -> "number", "dept" -> "string"), "e.pdf"),
      (6, Map[String, String](), Map[String, String](), "f.xml"),
      (7, Map("day" -> "2024-06-15", "year" -> "2024.5"),
        Map("day" -> "date", "year" -> "number"), "g.pdf")
    )
    rows.toDF("id", "metadata", "metadata_types", "filename")
  }

  def ids(json: String, reserved: Map[String, org.apache.spark.sql.Column] = Map.empty): Set[Int] = {
    val ctx = Ctx(col("metadata"), col("metadata_types"), reserved)
    docs.filter(MetadataFilter.compile(json, ctx)).select("id").as[Int].collect().toSet
  }

  test("implicit equality matches scalar") {
    assert(ids("""{"dept": "finance"}""") == Set(1))
  }

  test("implicit equality matches array membership") {
    assert(ids("""{"tags": "a"}""") == Set(4))
    assert(ids("""{"tags": "z"}""") == Set.empty)
  }

  test("typed $gt on number excludes malformed and wrong-typed values") {
    // id 5 declares number but holds garbage -> try_cast null -> excluded.
    // id 7 "2024.5" > 2023 -> included.
    assert(ids("""{"year": {"$gt": 2023}}""") == Set(1, 7))
  }

  test("typed $gte/$lte range") {
    assert(ids("""{"year": {"$gte": 2023, "$lte": 2024}}""") == Set(1, 2))
  }

  test("$eq numeric matches both typed number and string rendering") {
    assert(ids("""{"year": {"$eq": 2024}}""") == Set(1))
  }

  test("decimal comparison") {
    assert(ids("""{"price": {"$gt": 19.5, "$lt": 20}}""") == Set(3))
  }

  test("datetime comparison") {
    assert(ids("""{"due": {"$gte": "2026-01-01T00:00:00Z"}}""") == Set(3))
    assert(ids("""{"due": {"$lt": "2026-01-01T00:00:00Z"}}""") == Set.empty)
  }

  test("date comparison") {
    assert(ids("""{"day": {"$gt": "2024-01-01"}}""") == Set(7))
  }

  test("$ne is null-safe: missing key counts as different") {
    val got = ids("""{"dept": {"$ne": "finance"}}""")
    assert(got == Set(2, 3, 4, 5, 6, 7)) // all but id 1; missing keys match
  }

  test("$in / $nin") {
    assert(ids("""{"dept": {"$in": ["finance", "eng"]}}""") == Set(1, 2))
    assert(ids("""{"dept": {"$nin": ["finance", "eng"]}}""") == Set(3, 4, 5, 6, 7))
  }

  test("$exists with bool coercion") {
    assert(ids("""{"year": {"$exists": true}}""") == Set(1, 2, 5, 7))
    assert(ids("""{"year": {"$exists": "yes"}}""") == Set(1, 2, 5, 7))
    assert(ids("""{"year": {"$exists": false}}""") == Set(3, 4, 6))
  }

  test("$type with alias canonicalization") {
    assert(ids("""{"year": {"$type": "int"}}""") == Set(1, 2, 5, 7))
    assert(ids("""{"tags": {"$type": ["list"]}}""") == Set(4))
  }

  test("$regex with i flag and array-awareness") {
    assert(ids("""{"dept": {"$regex": "^fin", "$options": "i"}}""") == Set(1, 5))
    assert(ids("""{"dept": {"$regex": "^fin"}}""") == Set(1))
    assert(ids("""{"tags": {"$regex": "^a$"}}""") == Set(4))
  }

  test("$contains case-insensitive, array-aware") {
    assert(ids("""{"dept": {"$contains": "FINAN"}}""") == Set(1, 5))
    assert(ids("""{"tags": {"$contains": "b"}}""") == Set(4))
  }

  test("boolean combinators incl. $nor and $not") {
    assert(ids("""{"$or": [{"dept": "finance"}, {"dept": "eng"}]}""") == Set(1, 2))
    assert(ids("""{"$nor": [{"dept": "finance"}, {"dept": "eng"}]}""") == Set(3, 4, 5, 6, 7))
    assert(ids("""{"$not": {"dept": "finance"}}""") == Set(2, 3, 4, 5, 6, 7))
    assert(ids("""{"$and": [{"year": {"$gte": 2024}}, {"dept": "finance"}]}""") == Set(1))
  }

  test("implicit eq null matches missing key") {
    assert(ids("""{"nope": null}""") == Set(1, 2, 3, 4, 5, 6, 7))
  }

  test("reserved column: null-safe $eq/$ne/$in on filename") {
    val r = Map("filename" -> col("filename"))
    assert(ids("""{"filename": {"$eq": null}}""", r) == Set(3))
    assert(ids("""{"filename": {"$ne": "a.pdf"}}""", r) == Set(2, 3, 4, 5, 6, 7))
    assert(ids("""{"filename": {"$in": ["a.pdf", null]}}""", r) == Set(1, 3))
    assert(ids("""{"filename": {"$regex": "\\.pdf$"}}""", r) == Set(1, 5, 7))
    assert(ids("""{"filename": {"$contains": ".pdf"}}""", r) == Set(1, 4, 5, 7))
  }

  test("$eq boolean") {
    assert(ids("""{"flag": {"$eq": true}}""") == Set(4))
  }

  // ---- edge cases mirroring the reference's TestSecurity/TestEdgeCases
  // (`test_metadata_filters.py:301-425`), asserted at result-set level

  /** Second fixture for value-edge cases. */
  lazy val edge: DataFrame = Seq(
    (1, Map("name" -> "O'Brien", "count" -> "0", "balance" -> "-250.5"),
      Map("name" -> "string", "count" -> "number", "balance" -> "number")),
    (2, Map("name" -> "测试用户", "count" -> "7", "large_number" -> "20000000000"),
      Map("name" -> "string", "count" -> "number", "large_number" -> "number")),
    (3, Map("amount" -> "999999999999.99", "ts" -> "2024-01-15T06:00:00Z",
        "day" -> "2024-02-29", "nested.field.name" -> "value", "blank" -> ""),
      Map("amount" -> "decimal", "ts" -> "datetime", "day" -> "date",
        "nested.field.name" -> "string", "blank" -> "string"))
  ).toDF("id", "metadata", "metadata_types")

  def eids(json: String): Set[Int] = {
    val ctx = Ctx(col("metadata"), col("metadata_types"), Map.empty)
    edge.filter(MetadataFilter.compile(json, ctx)).select("id").as[Int].collect().toSet
  }

  test("single-quote values pass through unbroken") {
    assert(eids("""{"name": "O'Brien"}""") == Set(1))
  }

  test("sql-looking regex is treated as a literal pattern, no injection") {
    assert(eids("""{"name": {"$regex": "'; DROP TABLE users; --"}}""") == Set.empty)
  }

  test("unicode values match exactly") {
    assert(eids("""{"name": "测试用户"}""") == Set(2))
  }

  test("empty or null filter objects match everything") {
    assert(eids("{}") == Set(1, 2, 3))
    assert(eids("null") == Set(1, 2, 3))
  }

  test("zero boundary in typed comparison") {
    assert(eids("""{"count": {"$gt": 0}}""") == Set(2))
    assert(eids("""{"count": {"$gte": 0}}""") == Set(1, 2))
  }

  test("negative numbers compare numerically, not lexically") {
    assert(eids("""{"balance": {"$lt": -100}}""") == Set(1))
    assert(eids("""{"balance": {"$lt": -300}}""") == Set.empty)
  }

  test("very large decimal equality") {
    assert(eids("""{"amount": {"$eq": "999999999999.99"}}""") == Set(3))
  }

  test("scientific-notation comparison value") {
    assert(eids("""{"large_number": {"$gt": 1e10}}""") == Set(2))
    assert(eids("""{"large_number": {"$gt": 3e10}}""") == Set.empty)
  }

  test("datetime comparison honors timezone offsets") {
    // 2024-01-15T12:30:00+05:00 == 07:30Z; stored ts is 06:00Z
    assert(eids("""{"ts": {"$lte": "2024-01-15T12:30:00+05:00"}}""") == Set(3))
    assert(eids("""{"ts": {"$gte": "2024-01-15T12:30:00+05:00"}}""") == Set.empty)
  }

  test("leap-year date equality") {
    assert(eids("""{"day": {"$eq": "2024-02-29"}}""") == Set(3))
  }

  test("empty-string value is a real equality target") {
    assert(eids("""{"blank": ""}""") == Set(3))
  }

  test("field names with dots are plain map keys") {
    assert(eids("""{"nested.field.name": "value"}""") == Set(3))
  }

  test("invalid $type name errors") {
    assertThrows[RuntimeException](eids("""{"x": {"$type": "nonsense"}}"""))
  }

  test("unsupported top-level operator errors") {
    assertThrows[RuntimeException](eids("""{"$xor": [{"a": 1}]}"""))
  }

  // ---- round-11 additions: the remaining reference cases
  // (`test_metadata_filters.py`), result-set asserted

  test("decimal-string operand compares numerically, not lexically") {
    // test_comparison_with_decimal_string: {"price": {"$lte": "99.99"}} —
    // a numeric STRING must hit the number/decimal branches
    assert(ids("""{"price": {"$lte": "99.99"}}""") == Set(3))
    assert(ids("""{"price": {"$lte": "19.5"}}""") == Set.empty)
    // lexical would put "19.99" < "2.5"; numeric must not
    assert(ids("""{"price": {"$lt": "2.5"}}""") == Set.empty)
    assert(eids("""{"amount": {"$gte": "1000000"}}""") == Set(3))
  }

  test("$eq with numeric string matches typed values numerically") {
    // "2024.0" as a numeric string must match the number-typed 2024 store
    assert(ids("""{"year": {"$eq": "2024.0"}}""") == Set(1))
    assert(ids("""{"year": {"$ne": "2024.0"}}""") == Set(2, 3, 4, 5, 6, 7))
  }

  test("ordering comparison on a plain non-numeric string errors") {
    // the reference raises InvalidMetadataFilterError: the string clause
    // is $eq/$ne-only (`metadata_filters.py:257-266`)
    assertThrows[RuntimeException](ids("""{"dept": {"$lt": "m"}}"""))
    assertThrows[RuntimeException](ids("""{"dept": {"$gte": "a"}}"""))
  }

  test("ordering comparison on a bool or null operand errors") {
    assertThrows[RuntimeException](ids("""{"flag": {"$gt": true}}"""))
    assertThrows[RuntimeException](ids("""{"year": {"$lt": null}}"""))
  }

  test("field-level $not with an operator object") {
    // test_not_operator: {"status": {"$not": {"$eq": "deleted"}}}
    assert(ids("""{"dept": {"$not": {"$eq": "finance"}}}""") == Set(2, 3, 4, 5, 6, 7))
    assert(ids("""{"year": {"$not": {"$gt": 2023}}}""") == Set(2, 3, 4, 5, 6))
  }

  test("$or composes a reserved filename filter with a metadata filter") {
    // test_filename_or_metadata: {"$or": [{"filename": {"$regex": ...}},
    // {"status": ...}]}
    val r = Map("filename" -> col("filename"))
    assert(ids("""{"$or": [{"filename": {"$regex": "\\.txt$"}}, {"dept": "finance"}]}""", r)
      == Set(1, 2))
  }

  test("$type with a non-string operand errors") {
    // test_type_operator_requires_string_or_list: {"value": {"$type": 123}}
    assertThrows[RuntimeException](ids("""{"year": {"$type": 123}}"""))
  }

  test("complex nested $and/$or") {
    // test_complex_nested_and_or
    assert(ids(
      """{"$and": [
        |  {"dept": {"$regex": "finance", "$options": "i"}},
        |  {"$or": [{"year": {"$gte": 2024}}, {"price": {"$gt": 10}}]},
        |  {"filename": {"$exists": true}}
        |]}""".stripMargin, Map("filename" -> col("filename"))) == Set(1))
  }

  test("mixed $type gate and comparison on the same field") {
    // test_mixed_type_and_comparison_filters: only rows DECLARED number
    // and numerically > pass — id 7 (2024.5 number) yes, id 5 (garbage
    // number-typed) no, id 3 (decimal-typed) no
    assert(ids(
      """{"$and": [{"year": {"$type": "number"}}, {"year": {"$gt": 2023}}]}""")
      == Set(1, 7))
  }

  test("datetime object rendering (space separator) compares as datetime") {
    // test_comparison_with_datetime_object: datetime(2024,1,1,12,0,0)
    // serializes with a space separator; dateTimeRe accepts [T ]
    assert(eids("""{"ts": {"$gte": "2024-01-01 12:00:00"}}""") == Set(3))
    assert(eids("""{"ts": {"$gte": "2024-01-16 00:00:00"}}""") == Set.empty)
  }

  test("date object comparison with $gte") {
    // test_comparison_with_date_object: date(2024,6,15)
    assert(ids("""{"day": {"$gte": "2024-06-15"}}""") == Set(7))
    assert(ids("""{"day": {"$gte": "2024-06-16"}}""") == Set.empty)
  }
}
