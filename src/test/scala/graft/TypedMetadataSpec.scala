package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.filters.TypedMetadata
import graft.filters.TypedMetadata.TypedMetadataError

/** Table-driven port of `core/tests/unit/test_typed_metadata.py`:
  * canonicalization + aliases, inference, per-type coercions, nested
  * sanitization, merge semantics, error cases. */
class TypedMetadataSpec extends AnyFunSuite {

  test("canonical names and aliases, case-insensitive") {
    val cases = Map(
      "string" -> "string", "str" -> "string", "text" -> "string",
      "int" -> "number", "integer" -> "number", "float" -> "number",
      "double" -> "number", "numeric" -> "number", "decimal" -> "decimal",
      "bool" -> "boolean", "timestamp" -> "datetime", "DateTime" -> "datetime",
      "LIST" -> "array", "dict" -> "object", "Map" -> "object", "null" -> "null")
    cases.foreach { case (in, want) =>
      assert(TypedMetadata.canonicalize(in) == want, in) }
  }

  test("invalid type errors, with field context") {
    val e = intercept[TypedMetadataError](
      TypedMetadata.canonicalize("nonsense", Some("f1")))
    assert(e.getMessage.contains("Unsupported metadata type"))
    assert(e.getMessage.contains("f1"))
  }

  test("empty metadata") {
    val b = TypedMetadata.normalize("{}")
    assert(b.values.isEmpty && b.types.isEmpty)
  }

  test("inferred types") {
    val b = TypedMetadata.normalize(
      """{"s": "plain", "n": 5, "f": 2.5, "b": true, "nil": null,
        |"dt": "2024-01-15T10:30:00Z", "arr": [1,2], "obj": {"k": "v"}}""".stripMargin)
    assert(b.types == Map("s" -> "string", "n" -> "number", "f" -> "number",
      "b" -> "boolean", "nil" -> "null", "dt" -> "datetime",
      "arr" -> "array", "obj" -> "object"))
    assert(b.values("n") == "5" && b.values("f") == "2.5")
    assert(b.values("nil") == null)
  }

  test("explicit hints override inference; null preserved under any hint") {
    val b = TypedMetadata.normalize(
      """{"year": "2024", "nil": null}""",
      Map("year" -> "number", "nil" -> "string"))
    assert(b.types("year") == "number" && b.values("year") == "2024")
    assert(b.types("nil") == "null" && b.values("nil") == null)
  }

  test("number coercion from string: int-like, underscores, floats") {
    def num(js: String) = TypedMetadata.normalize(
      s"""{"x": $js}""", Map("x" -> "number")).values("x")
    assert(num("\"42\"") == "42")
    assert(num("\"1_000_000\"") == "1000000")
    assert(num("\"-17\"") == "-17")
    assert(num("\"3.14\"") == "3.14")
  }

  test("number coercion rejects boolean, empty, garbage") {
    def bad(js: String, hint: String = "number") =
      intercept[TypedMetadataError](
        TypedMetadata.normalize(s"""{"x": $js}""", Map("x" -> hint)))
    assert(bad("true").getMessage.contains("boolean/null"))
    assert(bad("\"\"").getMessage.contains("empty string"))
    assert(bad("\"abc\"").getMessage.contains("numeric"))
  }

  test("decimal coercion and normalization strips trailing zeros") {
    def dec(js: String) = TypedMetadata.normalize(
      s"""{"x": $js}""", Map("x" -> "decimal")).values("x")
    assert(dec("\"19.9900\"") == "19.99")
    assert(dec("\"100.000\"") == "100")
    assert(dec("\"0.000\"") == "0")
    assert(dec("7") == "7")
    assert(dec("\"999999999999.99\"") == "999999999999.99")
  }

  test("datetime coercion: Z, offset, naive, space separator") {
    def dt(js: String) = TypedMetadata.normalize(
      s"""{"x": $js}""", Map("x" -> "datetime")).values("x")
    assert(dt("\"2024-01-15T10:30:00Z\"") == "2024-01-15T10:30:00+00:00")
    assert(dt("\"2024-01-15T10:30:00+05:00\"") == "2024-01-15T10:30:00+05:00")
    assert(dt("\"2024-01-15T10:30:00\"") == "2024-01-15T10:30:00")
    assert(dt("\"2024-01-15 10:30:00\"") == "2024-01-15T10:30:00")
  }

  test("datetime coercion preserves fractional seconds; date-only coerces to midnight") {
    def dt(js: String) = TypedMetadata.normalize(
      s"""{"x": $js}""", Map("x" -> "datetime")).values("x")
    // fromisoformat(...).isoformat() keeps microseconds (6 digits when nonzero)
    assert(dt("\"2024-01-15T10:30:00.123456\"") == "2024-01-15T10:30:00.123456")
    assert(dt("\"2024-01-15T10:30:00.5Z\"") == "2024-01-15T10:30:00.500000+00:00")
    assert(dt("\"2024-01-15T10:30:00.000\"") == "2024-01-15T10:30:00")
    // fromisoformat('2024-01-15') == datetime(2024, 1, 15, 0, 0)
    assert(dt("\"2024-01-15\"") == "2024-01-15T00:00:00")
  }

  test("date coercion: date string, datetime string truncates") {
    def d(js: String) = TypedMetadata.normalize(
      s"""{"x": $js}""", Map("x" -> "date")).values("x")
    assert(d("\"2024-02-29\"") == "2024-02-29")
    assert(d("\"2024-01-15T10:30:00Z\"") == "2024-01-15")
  }

  test("boolean coercion from string and number") {
    def b(js: String) = TypedMetadata.normalize(
      s"""{"x": $js}""", Map("x" -> "boolean")).values("x")
    Seq("\"true\"", "\"1\"", "\"yes\"", "\"Y\"", "\"on\"", "1", "2.5")
      .foreach(s => assert(b(s) == "true", s))
    Seq("\"false\"", "\"0\"", "\"no\"", "\"N\"", "\"off\"", "0")
      .foreach(s => assert(b(s) == "false", s))
    assert(intercept[TypedMetadataError](b("\"maybe\""))
      .getMessage.contains("'true' or 'false'"))
  }

  test("array/object preserved as JSON; nested strings pass through verbatim") {
    // `_sanitize_nested` converts only datetime/date/Decimal objects — JSON
    // input never produces those, so strings (even ISO-looking) are kept
    // as-is (`test_array_preservation`).
    val b = TypedMetadata.normalize(
      """{"arr": [1, "2024-01-15T10:30:00Z", "x"], "obj": {"at": "2024-01-15T10:30:00Z"}}""")
    assert(b.types == Map("arr" -> "array", "obj" -> "object"))
    assert(b.values("arr") == """[1,"2024-01-15T10:30:00Z","x"]""")
    assert(b.values("obj") == """{"at":"2024-01-15T10:30:00Z"}""")
  }

  test("array/object hints reject scalars") {
    assert(intercept[TypedMetadataError](
      TypedMetadata.normalize("""{"x": 5}""", Map("x" -> "array")))
      .getMessage.contains("expects an array"))
    assert(intercept[TypedMetadataError](
      TypedMetadata.normalize("""{"x": [1]}""", Map("x" -> "object")))
      .getMessage.contains("expects an object"))
  }

  test("merge overlays updates, adds fields, allows type change and clearing") {
    val base = TypedMetadata.normalize("""{"a": 1, "b": "keep"}""")
    val m = TypedMetadata.merge(base, """{"a": "now-string", "c": true, "b": null}""")
    assert(m.values("a") == "now-string" && m.types("a") == "string")
    assert(m.values("c") == "true" && m.types("c") == "boolean")
    assert(m.values("b") == null && m.types("b") == "null")
  }

  test("empty-string datetime/date coercions error") {
    assert(intercept[TypedMetadataError](
      TypedMetadata.normalize("""{"x": ""}""", Map("x" -> "datetime")))
      .getMessage.contains("datetime"))
    assert(intercept[TypedMetadataError](
      TypedMetadata.normalize("""{"x": ""}""", Map("x" -> "date")))
      .getMessage.contains("date"))
    assert(intercept[TypedMetadataError](
      TypedMetadata.normalize("""{"x": "not-a-date"}""", Map("x" -> "datetime")))
      .getMessage.contains("ISO8601"))
    assert(intercept[TypedMetadataError](
      TypedMetadata.normalize("""{"x": "12.a"}""", Map("x" -> "decimal")))
      .getMessage.contains("decimal"))
  }
}
