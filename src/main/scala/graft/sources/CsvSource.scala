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
    * `sc.addFile(url)` then a local read). The driver fetches the
    * file and parses its LINES through `DataFrameReader.csv(Dataset)`,
    * so the data ships to executors inside the dataset itself. The
    * obvious-looking alternative — `spark.read.csv(SparkFiles.get(
    * name))`, which is literally what the reference does — embeds the
    * DRIVER's local temp path in the scan and throws
    * FileNotFoundException on any multi-machine cluster (each
    * executor's SparkFiles root is its own).
    *
    * Two deliberate hygiene points over raw `addFile`:
    *  - each call fetches to its own UUID-named temp file for the
    *    direct schemes (http/https/ftp/file), so re-fetching a
    *    changed remote file returns the NEW contents and two distinct
    *    URLs sharing a basename never collide — `addFile` would
    *    silently serve the first session-lifetime cached copy in both
    *    cases. (Other schemes, e.g. hdfs, still go through `addFile`
    *    and inherit its session-cache contract.)
    *  - the fetch is SIZE-CAPPED (`maxBytes`, default 64 MiB) and
    *    aborts with a diagnosis instead of exhausting driver memory:
    *    driver-side lines are correct BY CONTRACT only because the
    *    query table is tiny — it is the broadcast side of every
    *    search join; bulk corpus data belongs in parquet on shared
    *    storage, not behind a URL.
    */
  def readUrl(spark: SparkSession, url: String, schema: StructType,
      header: Boolean = true, sep: String = ",",
      maxBytes: Long = 64L << 20): DataFrame = {
    import java.nio.file.{Files, Paths}
    val uri = new java.net.URI(url)
    // decoded URI path; query strings ("q.csv?token=x") are not part
    // of the file name.
    val name = new java.io.File(uri.getPath).getName
    require(name.nonEmpty, s"URL has no file component: $url")
    import scala.jdk.CollectionConverters._
    val lines = uri.getScheme match {
      case null | "file" | "http" | "https" | "ftp" =>
        val tmp = Files.createTempFile("graft-url-", s"-$name")
        try {
          val in = uri.getScheme match {
            case null => Files.newInputStream(Paths.get(url))
            case "file" => Files.newInputStream(Paths.get(uri))
            case _ =>
              // explicit timeouts: addFile's fetcher enforced
              // spark.files.fetchTimeout; a raw openStream() would
              // hang the driver forever on a stalled endpoint.
              val conn = uri.toURL.openConnection()
              conn.setConnectTimeout(FetchTimeoutMs)
              conn.setReadTimeout(FetchTimeoutMs)
              conn.getInputStream
          }
          try fetchCapped(in, tmp, maxBytes, url) finally in.close()
          Files.readAllLines(tmp).asScala.toSeq
        } finally Files.deleteIfExists(tmp)
        // deleted eagerly: each call fetches fresh by design, so a
        // long-lived serving driver must not accumulate temp copies.
      case _ =>
        // hdfs/s3a/...: Spark's fetcher knows these; session-cached.
        spark.sparkContext.addFile(url)
        val p = Paths.get(org.apache.spark.SparkFiles.get(name))
        require(Files.size(p) <= maxBytes, sizeMessage(url, maxBytes))
        Files.readAllLines(p).asScala.toSeq
    }
    import spark.implicits._
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", sep)
      .csv(spark.createDataset(lines))
  }

  /** Connect/read timeout for direct URL fetches (the contract
    * `spark.files.fetchTimeout` provided on the addFile path).
    */
  private val FetchTimeoutMs = 60000

  private def sizeMessage(url: String, maxBytes: Long): String =
    s"fetched file exceeds the query-table size cap ($maxBytes bytes): $url — " +
      "readUrl materializes the query table on the driver by contract " +
      "(it is the broadcast side of every search join); bulk data " +
      "belongs in parquet on shared storage, not behind a URL"

  /** Stream-copy `in` to `out`, aborting as soon as the byte count
    * exceeds `maxBytes` — the guard fires BEFORE the download
    * completes, so a runaway URL costs at most `maxBytes` of disk.
    */
  private def fetchCapped(in: java.io.InputStream, out: java.nio.file.Path,
      maxBytes: Long, url: String): Unit = {
    val os = java.nio.file.Files.newOutputStream(out)
    try {
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) {
        total += n
        require(total <= maxBytes, sizeMessage(url, maxBytes))
        os.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally os.close()
  }
}
