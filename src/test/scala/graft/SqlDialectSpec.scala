package graft

import org.apache.spark.sql.functions._

import graft.functions.Tokenize

/** Spark-dialect SQL clean chain parity with the codegen'd clean. */
class SqlDialectSpec extends SparkTestBase {
  import spark.implicits._

  test("cleanSqlSpark matches Tokenize.clean on reference-shaped values") {
    val vals = Seq("James Cameron", "Pirates of the Caribbean: At World's End",
      "Sam Raimi", "  The  QUICK  brown fox!!", "café au lait", "a",
      "Customer#000000001", "", "the of and")
    val df = vals.toDF("v")
    df.createOrReplaceTempView("clean_probe")
    val got = spark.sql(
      s"SELECT ${Tokenize.cleanSqlSpark("v")} AS c FROM clean_probe")
      .as[String].collect().toSeq
    val want = df.select(Tokenize.clean(col("v")).as("c"))
      .as[String].collect().toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }
}
