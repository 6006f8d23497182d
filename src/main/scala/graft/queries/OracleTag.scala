package graft.queries

/** DuckDB twin of [[graft.Tables.corpusTag]] — the in-band negative-control
  * fixture tag (r14 verdict ask #4). Splice [[col]] into an oracle's final
  * SELECT (`, ${OracleTag.col}`) for every registry query whose inputs are
  * synthesized from doc_ids/fixed rules alone: without it the wrong-sf
  * control computes identical output on the wrong data and the per-query
  * negative-control guarantee is vacuous for that row.
  *
  * Both engines hash the identical `doc_id:text` string (BIGINT→VARCHAR
  * formatting agrees for integral ids — the requireString discipline is
  * about FRACTIONAL drift) and sum exact 24-bit integers, so the tag is
  * partition-order-free and engine-identical at the right sf, different
  * across sfs (documents' text is regenerated per sf even where the row
  * count is not).
  */
object OracleTag {
  val sql: String =
    "(SELECT sum(('0x' || substr(md5(doc_id || ':' || text), 1, 6))" +
      "::BIGINT)::BIGINT FROM documents)"
  val col: String = s"$sql AS fixture"
}
