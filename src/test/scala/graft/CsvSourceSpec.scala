package graft

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.sinks.ConsoleSink
import graft.sources.CsvSource

/** CSV source roundtrip + console sink rendering. */
class CsvSourceSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("name", StringType), StructField("seg", StringType)))

  test("csv write/read roundtrip preserves rows, schema is explicit") {
    val path = s"${sys.props("java.io.tmpdir")}/graft-csv-spec"
    val df = Seq(("Customer#1", "BUILDING"), ("Customer#2", "AUTO MOBILE"),
      ("x,with,commas", "\"quoted\"")).toDF("name", "seg")
    CsvSource.write(df, path)
    val back = CsvSource.read(spark, path, schema)
    assert(back.schema == schema)
    assert(back.as[(String, String)].collect().toSet ==
      df.as[(String, String)].collect().toSet)
  }

  test("readUrl ingests a single CSV file via a per-call capped fetch") {
    val f = java.io.File.createTempFile("graft-url-spec", ".csv")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      "name,seg\nCustomer#1,BUILDING\nCustomer#2,AUTOMOBILE\n".getBytes("UTF-8"))
    val back = CsvSource.readUrl(spark, f.toURI.toString, schema)
    assert(back.schema == schema)
    assert(back.as[(String, String)].collect().toSet ==
      Set(("Customer#1", "BUILDING"), ("Customer#2", "AUTOMOBILE")))
  }

  test("readUrl re-fetch sees changed contents (no stale session cache)") {
    val f = java.io.File.createTempFile("graft-url-stale", ".csv")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      "name,seg\nCustomer#1,BUILDING\n".getBytes("UTF-8"))
    assert(CsvSource.readUrl(spark, f.toURI.toString, schema).count() == 1L)
    // same URL, new contents: addFile would serve the first copy
    java.nio.file.Files.write(f.toPath,
      "name,seg\nCustomer#1,BUILDING\nCustomer#2,AUTOMOBILE\n".getBytes("UTF-8"))
    assert(CsvSource.readUrl(spark, f.toURI.toString, schema).count() == 2L)
  }

  test("readUrl refuses oversized files with a diagnosis instead of an OOM") {
    val f = java.io.File.createTempFile("graft-url-big", ".csv")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      ("name,seg\n" + "Customer#1,BUILDING\n" * 100).getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      CsvSource.readUrl(spark, f.toURI.toString, schema, maxBytes = 128L)
    }
    assert(e.getMessage.contains("size cap"), e.getMessage)
    assert(e.getMessage.contains("parquet"), e.getMessage)
  }

  test("seq console format matches the reference's printed lines") {
    // <table, score, column scores{col: n, ...}> per Object.py:100-104
    val topCols = Seq((125, 1, 2L), (125, 2, 2L), (123, 1, 1L), (123, 2, 1L))
      .toDF("table_id", "column_id", "join_score")
    val out = ConsoleSink.renderSeqMatches(topCols)
    assert(out ==
      "<125, 4, column scores{1: 2, 2: 2}>\n<123, 2, column scores{1: 1, 2: 1}>",
      out)
  }

  test("console sink renders a deterministic fixed-width table") {
    val df = Seq((1, "customer"), (2, "orders")).toDF("table_id", "name")
      .orderBy("table_id")
    val out = ConsoleSink.render(df)
    val lines = out.split("\n")
    assert(lines.length == 6, out) // sep, header, sep, 2 rows, sep
    assert(lines(1).contains("table_id") && lines(1).contains("name"))
    assert(lines(3).contains("1") && lines(3).contains("customer"))
    assert(lines.map(_.length).distinct.length == 1, "ragged table:\n" + out)
  }
}
