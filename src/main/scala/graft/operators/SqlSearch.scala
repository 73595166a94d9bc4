package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Tokenize

/** The end-to-end col-wise search as ONE `spark.sql` statement over
  * temp views — the engine's SQL surface. The reference's only query
  * interface was generated SQL strings (f-string IN-list templates,
  * `handlers.py:62-83`, SURVEY F3/F4, originally dismissed as
  * n/a-design); this is that surface done properly: a single
  * declarative statement Catalyst plans exactly like the DataFrame
  * pipeline (same windows, same broadcasts under AQE), over the same
  * session-cached index. Users who live in SQL can run the whole
  * engine without touching the DataFrame API.
  *
  * The statement mirrors the windowed pipeline stage for stage (the
  * same CTE chain the DuckDB oracle runs, in the Spark dialect —
  * [[Tokenize.cleanSqlSpark]]), so the registered query shares the
  * standard table-scores oracle verbatim.
  *
  * Cost note: this runs several seconds slower than the DataFrame
  * forms at sf0.1 — almost entirely ANALYSIS time, because CTE
  * inlining replicates the ~96-regex clean chain at every `maps`
  * reference. That is the surface's price, paid once per statement;
  * the DataFrame pipelines (which clean through one codegen'd
  * static call) remain the perf path.
  */
object SqlSearch {

  /** Ranked table scores via `spark.sql`. `index` must be the built
    * postings DataFrame (it is registered as a temp view).
    */
  def searchTablesSql(spark: SparkSession, index: DataFrame, query: DataFrame,
      cols: Seq[String], maxTables: Int = 20): DataFrame = {
    index.createOrReplaceTempView("graft_sql_index")
    query.createOrReplaceTempView("graft_sql_query")
    val n = cols.size
    val colList = cols.map(c => s"`$c`").mkString(", ")
    val notNull = cols.map(c => s"`$c` IS NOT NULL").mkString(" AND ")
    val cleaned = cols.map { c =>
      s"""${Tokenize.cleanSqlSpark(s"replace(`$c`, chr(160), '')")} AS `$c`"""
    }.mkString(",\n      ")
    val mapKey = cols.map(c => s"`$c`").mkString(" || chr(1) || ")
    val mapBranches = cols.map { c =>
      s"""SELECT `$c` AS key, $mapKey AS map_key FROM qclean"""
    }.mkString("\n    UNION ALL ")
    spark.sql(s"""WITH qraw AS (SELECT $colList FROM graft_sql_query),
  qdedup AS (SELECT DISTINCT $colList FROM qraw WHERE $notNull),
  qclean AS (
    SELECT DISTINCT $cleaned
    FROM qdedup
  ),
  maps AS (
    $mapBranches
  ),
  postings AS (
    SELECT i.key, i.table_id, i.column_id, i.row_id FROM graft_sql_index i
    WHERE i.key IN (SELECT key FROM maps)
  ),
  reduced AS (
    SELECT key, table_id, min(column_id) AS column_id, row_id
    FROM postings GROUP BY key, table_id, row_id
  ),
  kept AS (
    SELECT key, table_id, column_id, row_id FROM (
      SELECT r.*, count(*) OVER (PARTITION BY table_id, row_id) AS cnt
      FROM reduced r
    ) WHERE cnt >= $n
  ),
  mapped AS (
    SELECT k.key, k.table_id, k.column_id, k.row_id, m.map_key
    FROM kept k JOIN maps m USING (key)
  ),
  matches AS (
    SELECT key, table_id, column_id, row_id, map_key FROM (
      SELECT md.*, count(*) OVER (PARTITION BY table_id, row_id, map_key) AS cnt
      FROM mapped md
    ) WHERE cnt >= $n
  ),
  col_scores AS (
    SELECT table_id, column_id, count(*) AS join_score
    FROM matches GROUP BY table_id, column_id
  ),
  top_cols AS (
    SELECT table_id, column_id, join_score FROM (
      SELECT cs.*, row_number() OVER (
        PARTITION BY table_id ORDER BY join_score DESC, column_id ASC) AS rn
      FROM col_scores cs
    ) WHERE rn <= $n
  ),
  tbl_scores AS (
    SELECT table_id, cast(sum(join_score) AS bigint) AS join_score
    FROM top_cols GROUP BY table_id
  )
SELECT table_id, join_score FROM tbl_scores
ORDER BY join_score DESC, table_id ASC LIMIT $maxTables""")
  }
}
