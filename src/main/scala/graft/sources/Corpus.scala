package graft.sources

/** Static catalog of the corpus ("data lake") tables the inverted
  * index is built from.
  *
  * The reference assumes the corpus was pre-tokenized offline into a
  * Vertica table `main_tokenized(tokenized, tableid, colid, rowid)`
  * (reference `handlers.py:15,54`, `Par_Search.py:186-191`). Our
  * engine performs that step itself from the parquet tables.
  *
  * Design notes (100 TB posture):
  *  - `rowId` is a deterministic injective function of the table's
  *    primary key, NOT a row_number over a global sort — a global
  *    window would serialize the build on one partition at scale.
  *    Any injective bigint works: row ids only need to identify a row
  *    within a table (reference rowid semantics).
  *  - Only natural string columns are indexed. The reference's corpus
  *    is text cells (`handlers.py:69-71`); casting numerics/timestamps
  *    to string is format-fragile across engines and adds no search
  *    value.
  *  - `rowIdExpr` is written in the SQL dialect intersection of Spark
  *    and DuckDB so the oracle can reuse it verbatim.
  */
object Corpus {

  /** One corpus table: stable id, indexed string columns (in schema
    * order, colId = 1-based position), and the row-id expression.
    */
  final case class Table(name: String, id: Int, textCols: Seq[String], rowIdExpr: String)

  /** Stable enumeration (alphabetical by name). `embeddings` has no
    * string column and is not indexed.
    */
  val tables: Seq[Table] = Seq(
    Table("customer", 1, Seq("c_name", "c_mktsegment"), "cast(c_custkey as bigint)"),
    Table("documents", 2, Seq("text", "lang", "source"), "cast(doc_id as bigint)"),
    Table("events", 3, Seq("event_type", "props"), "cast(event_id as bigint)"),
    // lineitem pk is (l_orderkey, l_linenumber); linenumber <= 7.
    Table("lineitem", 4, Seq("l_returnflag", "l_linestatus"),
      "cast(l_orderkey as bigint) * 10 + cast(l_linenumber as bigint)"),
    Table("nation", 5, Seq("n_name"), "cast(n_nationkey as bigint)"),
    Table("orders", 6, Seq("o_orderstatus", "o_orderpriority"), "cast(o_orderkey as bigint)"),
    Table("part", 7, Seq("p_name", "p_brand", "p_type"), "cast(p_partkey as bigint)"),
    Table("region", 8, Seq("r_name"), "cast(r_regionkey as bigint)"),
    Table("supplier", 9, Seq("s_name"), "cast(s_suppkey as bigint)"))

  def byName(name: String): Table = tables.find(_.name == name).get
}
