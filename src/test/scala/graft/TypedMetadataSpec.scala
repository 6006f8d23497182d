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

  // ---- round-11 additions: remaining reference cases
  // (`test_typed_metadata.py`)

  test("merge stamps external_id only when missing") {
    // test_merge_preserves_external_id / test_merge_sets_external_id_if_missing
    val withId = TypedMetadata.normalize("""{"external_id": "doc-123"}""")
    val kept = TypedMetadata.merge(withId, """{"key": "value"}""",
      externalId = Some("doc-123"))
    assert(kept.values("external_id") == "doc-123")
    val without = TypedMetadata.normalize("""{"key": "value"}""")
    val stamped = TypedMetadata.merge(without, "{}", externalId = Some("doc-456"))
    assert(stamped.values("external_id") == "doc-456")
    assert(stamped.types("external_id") == "string")
    // an update carrying its own external_id wins over the setdefault
    val updated = TypedMetadata.merge(without, """{"external_id": "doc-789"}""",
      externalId = Some("doc-456"))
    assert(updated.values("external_id") == "doc-789")
  }

  test("merge of empty updates is the identity") {
    val base = TypedMetadata.normalize("""{"a": 1}""")
    val m = TypedMetadata.merge(base, "{}")
    assert(m.values == base.values && m.types == base.types)
  }

  test("scientific notation renders Python-style fixed point") {
    // test_scientific_notation: "1.23e10" -> 1.23e10; the normalized
    // string form is repr(float)-shaped, never Java E-notation
    def num(js: String) = TypedMetadata.normalize(
      s"""{"x": $js}""", Map("x" -> "number")).values("x")
    assert(num("\"1.23e10\"") == "12300000000.0")
    assert(num("\"1e10\"") == "10000000000.0")
    assert(num("\"2.5e-3\"") == "0.0025")
    assert(num("\"1e16\"") == "1e+16")
    assert(num("\"1e-5\"") == "1e-05")
    assert(num("\"-1.23e10\"") == "-12300000000.0")
  }

  test("number coercion rejects infinity") {
    // test_number_coercion_rejects_nan_and_infinity (JSON cannot spell
    // NaN; an overflowing literal parses to +inf and must be rejected)
    val e = intercept[TypedMetadataError](
      TypedMetadata.normalize("""{"x": "1e999"}""", Map("x" -> "number")))
    assert(e.getMessage.contains("NaN or infinite"))
  }

  test("datetime/date coercion from epoch numbers (the from-object analog)") {
    // test_datetime_coercion_from_datetime_object / date_object arrive as
    // Python objects in the reference; the engine's analog input is an
    // epoch-seconds number
    val b = TypedMetadata.normalize(
      """{"dt": 1705314600, "d": 1705314600}""",
      Map("dt" -> "datetime", "d" -> "date"))
    assert(b.values("dt") == "2024-01-15T10:30:00+00:00")
    assert(b.values("d") == "2024-01-15")
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
