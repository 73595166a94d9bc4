package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.operators.JoinSearch
import graft.oracle.SearchOracle
import graft.oracle.SearchOracle.QuerySpec
import graft.sources.IndexBuilder

/** Scaled-lake spot-oracle harness: the BASE-corpus query probed
  * against the SCALED inverted index — the exact lineage the
  * `graft.Scale` / `graft.Stress` trend rows time ("the experiment
  * scales the corpus, not the query") — dumped in `graft.Verify`'s
  * layout so `tools/compare.py` hash-gates it against DuckDB as-is.
  *
  * Why the registered queries can't serve here: `SparkEntry.queries`
  * derive the query table from the SAME corpus dir, so at ×1000 the
  * customer probe carries ~1 M distinct name keys whose clones fan
  * the probed posting set to ~1e9 rows — in SPARK that completes
  * (spilling windows, 353 s at 4 GiB), but the DuckDB ORACLE's
  * windowed stages need the whole probed set in memory/temp at once
  * and exceeded this box twice (kernel OOM at 130 GB RSS with the
  * limit high; 63 GB of temp with it low). The oracle protocol the
  * scale trend actually claims is base-query-over-scaled-index, and
  * THAT DuckDB can verify exactly: ~1 k query keys, probed postings
  * ~1e6, one streaming pass over the tokenized-union CTE.
  *
  * Usage: `runMain graft.ScaleOracle <scaledDir> <baseDir> [outDir]
  * [families...]` (baseDir may instead come from `GRAFT_BASEDIR`)
  * then `python3 tools/compare.py <scaledDir> <outDir>`.
  * The emitted oracle SQL reads the BASE query table via
  * `read_parquet('<baseDir>/...')` — compare.py's views over
  * `<scaledDir>` keep serving the index side.
  */
object ScaleOracle {

  /** DuckDB `read_parquet` over a file-or-directory path, with single
    * quotes escaped SQL-style — the path lands inside a string literal
    * in the emitted oracle, so an unescaped quote in a directory name
    * would otherwise break (or redirect) the oracle query
    * (round-15 ADVICE).
    */
  private def pq(path: String): String = {
    val pat = if (new java.io.File(path).isDirectory) s"$path/*.parquet"
      else path
    s"read_parquet('${pat.replace("'", "''")}')"
  }

  def main(args: Array[String]): Unit = {
    val scaledDir = args(0)
    // base corpus dir: positional arg, else GRAFT_BASEDIR — no
    // machine-specific absolute path baked into source (round-15
    // ADVICE).
    val baseDir = args.lift(1)
      .orElse(sys.env.get("GRAFT_BASEDIR"))
      .getOrElse(sys.error(
        "ScaleOracle needs a base corpus dir: pass it as arg 2 or set GRAFT_BASEDIR"))
    val outDir = args.lift(2).getOrElse("/tmp/scale_oracle")
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.fromEnv(cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    lazy val idx = IndexBuilder.cached(spark, scaledDir)
    val customerBase = QuerySpec(
      s"SELECT c_name, c_mktsegment FROM ${pq(s"$baseDir/customer.parquet")} " +
        "WHERE c_custkey % 15 = 1",
      Queries.customerCols)
    val partBase = QuerySpec(
      s"SELECT p_name, p_brand, p_type FROM ${pq(s"$baseDir/part.parquet")} " +
        "WHERE p_partkey % 20 = 1",
      Queries.partCols)

    val families: Seq[(String, () => DataFrame, String)] = Seq(
      ("search_customer_base",
        () => JoinSearch.searchTables(idx,
          Queries.customerQuery(spark, baseDir), Queries.customerCols),
        SearchOracle.tableScores(customerBase)),
      ("search_part_base",
        () => JoinSearch.searchTables(idx,
          Queries.partQuery(spark, baseDir), Queries.partCols),
        SearchOracle.tableScores(partBase)))

    val run = families.filter { case (n, _, _) => only.isEmpty || only(n) }
    run.foreach { case (name, fn, _) =>
      fn().coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[scale-oracle] dumped $name")
    }
    // JSON escaping mirrors graft.Verify (control chars included).
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = run.map { case (name, _, sql) => s"${q(name)}: ${q(sql)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
