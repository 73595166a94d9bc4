package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query inventory lives in [[Queries]] (reference surface) plus
  * the extension modules it aggregates.
  */
object SparkEntry {

  private def registry: Seq[Q] = Queries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * end-to-end multi-attribute join search over the inverted index.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    operators.JoinSearch.searchTables(
      sources.IndexBuilder.cached(spark, dir),
      Queries.customerQuery(spark, dir),
      Queries.customerCols)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** Registry in deterministic registration order (Map iteration order
    * is hash-driven and let whichever query ran first absorb lazy
    * index materialization — see VERDICT r1 "What's wrong" #4).
    */
  def orderedQueries: Seq[(String, (SparkSession, String) => DataFrame)] =
    registry.map(q => q.name -> q.fn)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    oracleSqlFor(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))

  /** Oracle SQL resolved against a concrete corpus dir: artifact-read
    * oracles (`Q.oracleOf`) embed the dir-derived durable-artifact
    * paths; everything else is the static SQL. [[Verify]] dumps this
    * form so `oracle_sql.json` always matches the dir it verified.
    */
  def oracleSqlFor(dir: String): Map[String, String] =
    registry.flatMap(q => q.oracleFor(dir).map(q.name -> _)).toMap
}
