package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1/S2: CSV query-table source. The reference's only query-table
  * input format is CSV (reference `main.py:6-7`,
  * `Par_Search.py:147-148`, pandas `read_csv`); here it is a thin,
  * explicit-schema wrapper over Spark's CSV reader.
  *
  * Design notes:
  *  - the schema is REQUIRED: `inferSchema` scans the data twice and
  *    guesses types per-file — a correctness and performance hazard
  *    the engine does not expose;
  *  - Spark range-splits uncompressed CSV, so the parallel read (S2)
  *    is the default behavior and the reference's sequential read
  *    (S1) is just the one-split degenerate case — no separate code
  *    path needed;
  *  - `multiLine` stays off (quoted newlines would force whole-file
  *    parsing, killing split parallelism; the reference's query
  *    tables have none).
  */
object CsvSource {

  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, sep: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", sep)
      .csv(path)

  /** Materialize a query table as a CSV dataset (fixture writer for
    * the roundtrip query and specs).
    */
  def write(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  /** URL ingestion — the reference's only ingress for the query table
    * is an HTTP CSV fetch (`main.py:6`, `Par_Search.py:147`
    * `sc.addFile(url)` then a local read). `addFile` fetches the file
    * once (http/https/ftp/file/hdfs schemes, exactly Spark's
    * `addFile` surface); the driver then reads the fetched copy's
    * LINES and parses them through `DataFrameReader.csv(Dataset)`, so
    * the data ships to executors inside the dataset itself. The
    * obvious-looking alternative — `spark.read.csv(SparkFiles.get(
    * name))`, which is literally what the reference does — embeds the
    * DRIVER's local temp path in the scan and throws
    * FileNotFoundException on any multi-machine cluster (each
    * executor's SparkFiles root is its own). Driver-side lines are
    * correct here BY CONTRACT: the query table is tiny — it is the
    * broadcast side of every search join; bulk corpus data belongs
    * in parquet on shared storage, not behind a URL.
    */
  def readUrl(spark: SparkSession, url: String, schema: StructType,
      header: Boolean = true, sep: String = ","): DataFrame = {
    // decoded URI path: addFile stores under the decoded basename,
    // and query strings ("q.csv?token=x") are not part of the name.
    val name = new java.io.File(new java.net.URI(url).getPath).getName
    require(name.nonEmpty, s"URL has no file component: $url")
    spark.sparkContext.addFile(url)
    val local = java.nio.file.Paths.get(org.apache.spark.SparkFiles.get(name))
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files.readAllLines(local).asScala.toSeq
    import spark.implicits._
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", sep)
      .csv(spark.createDataset(lines))
  }
}
