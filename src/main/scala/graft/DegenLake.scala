package graft

import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The ADVERSARIAL CONFORMANCE LAKE: all ten corpus tables carrying
  * the degenerate shapes a real crawl contains (null event
  * timestamps/values/types, malformed props JSON, duplicate and
  * NEGATIVE hash-derived ids, null / zero-norm / empty / NaN
  * embedding vectors, null catalog names, orphan foreign keys,
  * duplicate query rows, multi-byte unicode, regex/SQL
  * metacharacter soup) beside a minimal normal core, plus the
  * all-EMPTY twin (day-one deployment). `DegenerateLakeSpec` runs
  * every registered query over both; `MaintainSpec` drives the delta
  * lifecycle over the mixed lake; and the runnable `main` writes the
  * lake to a real dir so the full DuckDB oracle gate can be pointed
  * at it (`graft.Verify <lake> <out>` + `tools/compare.py` — the
  * round-12 verdict #3 hash gate over degenerate data).
  *
  * Usage: `runMain graft.DegenLake <outDir> [empty]`.
  */
object DegenLake {

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val mixed = !args.drop(1).contains("empty")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("WARN")
    writeLake(spark, out, mixed)
    println(s"degenerate lake (mixed=$mixed) written to $out")
    spark.stop()
  }

  /** Write the lake into `d` — every table in the exact
    * /root/testdata schema.
    */
  def writeLake(spark: org.apache.spark.sql.SparkSession, d: String,
      mixed: Boolean): Unit = {
    def w(name: String, schema: StructType, rows: Seq[Row]): Unit =
      spark.createDataFrame(
          spark.sparkContext.parallelize(if (mixed) rows else Seq.empty[Row], 2),
          schema)
        .write.mode("overwrite").parquet(s"$d/$name.parquet")
    w("region", regionSchema, regionRows)
    w("nation", nationSchema, nationRows)
    w("customer", customerSchema, customerRows)
    w("supplier", supplierSchema, supplierRows)
    w("part", partSchema, partRows)
    w("orders", ordersSchema, ordersRows)
    w("lineitem", lineitemSchema, lineitemRows)
    w("events", eventsSchema, eventsRows)
    w("documents", documentsSchema, documentsRows)
    w("embeddings", embeddingsSchema, embeddingsRows)
  }

  /** Write the MIXED lake into a fresh temp dir — the shared fixture
    * for suites composing over the same adversarial corpus.
    */
  def writeMixedLake(spark: org.apache.spark.sql.SparkSession): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-deglake-shared").toString
    writeLake(spark, d, mixed = true)
    d
  }


  private def ntz(s: String): LocalDateTime = LocalDateTime.parse(s)

  // ----- schemas (mirror /root/testdata exactly) -----
  val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType), StructField("r_name", StringType)))
  val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))
  val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))
  val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType), StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))
  val partSchema = StructType(Seq(
    StructField("p_partkey", LongType), StructField("p_name", StringType),
    StructField("p_brand", StringType), StructField("p_type", StringType),
    StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))
  val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampNTZType),
    StructField("o_orderpriority", StringType)))
  val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampNTZType)))
  val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))
  val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))
  val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  // ----- mixed degenerate rows -----
  val regionRows: Seq[Row] = Seq(
    Row(0, "AFRICA"), Row(1, null), Row(2, ""))

  val nationRows: Seq[Row] = Seq(
    Row(0, "GERMANY", 0), Row(1, null, 1), Row(2, "", 2),
    Row(3, "FRANCE", 99)) // orphan region key

  /** Query-table shapes: custkey % 15 == 1 rows feed the flagship
    * customer search — one normal, one null-name, one NBSP, and an
    * ALL-DUPLICATE pair (the verdict's duplicate-query-rows shape).
    */
  val customerRows: Seq[Row] = Seq(
    Row(1L, "Customer one", 0, 100.5, "BUILDING"),
    Row(16L, null, 1, null, "MACHINERY"),
    Row(31L, "Customer nbsp", null, -3.0, null),
    Row(46L, "Dup customer", 2, 0.0, "BUILDING"),
    Row(46L, "Dup customer", 2, 0.0, "BUILDING"), // exact duplicate row
    Row(61L, null, 3, 7.0, null),                 // all-null query attrs
    Row(2L, "Customer two", 0, 55.0, "AUTOMOBILE"),
    Row(3L, "", 1, 0.0, ""),
    Row(-14L, "Negative cust", 0, 5.0, "BUILDING")) // hash-derived id

  val supplierRows: Seq[Row] = Seq(
    Row(1L, "Supplier one", 0, 10.0),
    Row(2L, null, null, null),
    Row(3L, "", 2, -1.0))

  val partRows: Seq[Row] = Seq(
    Row(1L, "azure gold part", "Brand#1", "SMALL BRASS", 5, 100.0),
    Row(2L, null, null, null, null, null),
    Row(3L, "", "", "", 0, 0.0),
    Row(4L, "misty rose part", "Brand#2", "LARGE STEEL", 50, 900.0),
    Row(16L, "navy linen part", "Brand#1", "SMALL BRASS", 3, 10.0))

  val ordersRows: Seq[Row] = Seq(
    Row(1L, 1L, "F", 100.0, ntz("2024-01-05T10:00:00"), "1-URGENT"),
    Row(2L, 1L, "O", 250.0, ntz("2024-02-10T09:30:00"), "3-MEDIUM"),
    Row(3L, 2L, null, null, null, null), // null status/price/date/priority
    Row(4L, 999L, "F", 10.0, ntz("2024-01-20T00:00:00"), "5-LOW"), // orphan cust
    Row(5L, 2L, "P", -50.0, ntz("2024-01-01T00:00:00"), "2-HIGH"),
    Row(6L, 3L, "O", 0.0, ntz("2024-03-01T23:59:59"), "4-NOT SPECIFIED"))

  val lineitemRows: Seq[Row] = Seq(
    Row(1L, 1L, 1L, 1, 5.0, 50.0, 0.05, 0.02, "A", "F", ntz("2024-01-06T00:00:00")),
    Row(1L, 4L, 1L, 2, 0.0, 0.0, 0.0, 0.0, "N", "O", ntz("2024-01-07T00:00:00")),
    Row(1L, 4L, 1L, 2, 0.0, 0.0, 0.0, 0.0, "N", "O", ntz("2024-01-07T00:00:00")),
    Row(2L, 4L, 2L, 1, 3.0, 30.0, null, null, null, null, null),
    Row(3L, 1L, 3L, 1, -2.0, -20.0, 0.1, 0.0, "R", "F", ntz("2024-02-15T12:00:00")),
    Row(4L, 16L, 1L, 1, 7.0, 70.0, 0.06, 0.01, "A", "F", ntz("2024-01-25T06:00:00")))

  val eventsRows: Seq[Row] = Seq(
    // a normal funnel for one user
    Row(1L, ntz("2024-01-01T10:00:00"), 1L, "view", 1.0, """{"k": 3}"""),
    Row(2L, ntz("2024-01-01T10:05:00"), 1L, "click", 2.0, """{"k": 7}"""),
    Row(3L, ntz("2024-01-01T10:10:00"), 1L, "purchase", 99.0, """{"k": 1}"""),
    Row(4L, ntz("2024-01-02T11:00:00"), 2L, "signup", 0.0, """{"k": 0}"""),
    Row(5L, ntz("2024-01-03T12:00:00"), 2L, "error", 1.0, """{"k": 12}"""),
    // the degenerate shapes
    Row(6L, null, 1L, "view", 1.0, """{"k": 5}"""), // null ts
    Row(7L, null, null, null, null, null),          // all-null payload
    Row(8L, ntz("2024-01-04T00:00:00"), 3L, null, null, "not json"),
    Row(9L, ntz("2024-01-04T00:00:01"), 3L, "view", Double.NaN, "{}"),
    Row(9L, ntz("2024-01-04T00:00:01"), 3L, "view", Double.NaN, "{}"), // dup id
    Row(10L, ntz("2024-01-04T00:00:02"), 3L, "", 0.0, """{"k": null}"""),
    Row(11L, ntz("2024-01-05T08:00:00"), 1L, "view", 4.0, null), // null props
    // negative (hash-derived) event/user ids
    Row(-3L, ntz("2024-01-06T09:00:00"), -2L, "view", 1.5, """{"k": 4}"""))

  /** The [[DegenerateCorpusSpec]] document shapes plus null lang and
    * null source rows (the page-view and langid contracts).
    */
  val documentsRows: Seq[Row] = {
    def normal(tag: String, n: Int): String =
      (1 to n).map(i => s"$tag$i").mkString(" ")
    Seq(
      Row(1L, "", "en", "srcA", 0L),
      Row(2L, null, "en", "srcA", 0L),
      Row(3L, "a", "en", "srcA", 1L),
      Row(4L, "a b", "en", "srcA", 3L),
      Row(5L, "x y z", "en", "srcB", 5L),
      Row(6L, normal("d", 4), "en", "srcB", 10L),
      Row(7L, normal("e", 7), "en", "srcB", 20L),
      Row(8L, "   ", "en", "srcC", 3L),
      Row(9L, "!!! ... ;;; ___", "en", "srcC", 15L),
      Row(10L, normal("w", 60), "en", "srcC", 200L),
      Row(11L, normal("w", 60) + " tail word", "en", "srcC", 210L),
      Row(12L, normal("v", 40), null, null, 150L), // null lang + source
      Row(13L, normal("u", 35), "xx", "srcA", 120L), // unknown lang code
      // hash-derived ids are NEGATIVE half the time in production
      // (xxhash64/murmur assignments): modular arithmetic on doc_id
      // (media modality pick, split/shard residues, fixture plants)
      // must not crash or mis-index on a negative residue.
      Row(-7L, normal("n", 25), "en", "srcB", 90L),
      Row(-1L, normal("m", 20), "en", "srcC", 70L),
      // a re-crawled DUPLICATE doc_id with different text: keyed
      // pipelines must complete (dedup/winnow/stats treat it as two
      // rows of one key — whatever each contract says, no crash).
      Row(10L, normal("w", 58), "en", "srcC", 195L),
      // multi-byte unicode (CJK + emoji + combining marks): byte
      // offsets != char offsets everywhere a pipeline slices text.
      Row(14L, "héllo wörld 你好世界 🌍🚀 café " + normal("z", 12),
        "zh", "srcB", 80L),
      // regex-metacharacter / quote / backslash soup: any pipeline
      // interpolating row text into a pattern or SQL fragment (rather
      // than treating it as data) breaks here.
      Row(15L, """a.*b (c|d) [e-f] \n \\ ' " ; -- $1 {2} ^x$ %s", """ +
        normal("q", 12), "en", "srcA", 90L))
  }

  /** 64-dim corpus with the ingest-door shapes: zero-norm, null,
    * empty-array and NaN vectors beside a small normal core (two
    * near-identical pairs so near-dup/cluster paths have structure).
    * Wrong-DIMENSION vectors are deliberately absent — that is a
    * schema-contract violation the sign-band indexing SHOULD fail
    * loudly on (ConventionSpec allowlist rationale) and is pinned by
    * its own test, not smuggled into a totality sweep.
    */
  val embeddingsRows: Seq[Row] = {
    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(i => math.sin(seed * 97 + i * 13).toFloat)
    def jitter(v: Seq[Float]): Seq[Float] =
      v.zipWithIndex.map { case (x, i) => if (i == 0) x + 1e-4f else x }
    val normals = (0 until 20).map(i => Row(i.toLong, vec(i), i % 10))
    normals ++ Seq(
      Row(-5L, vec(30), 5),                    // negative (hash-derived) id
      Row(3L, vec(3), 3),                      // duplicate vec_id, same payload
      Row(20L, jitter(vec(0)), 0),            // near-dup of vec 0
      Row(21L, jitter(vec(1)), 1),            // near-dup of vec 1
      Row(22L, Seq.fill(64)(0.0f), 2),        // zero-norm
      Row(23L, null, 3),                      // null vector
      Row(24L, Seq.empty[Float], 4),          // empty array
      Row(25L, Seq.fill(64)(Float.NaN), null)) // NaN vector, null label
  }
}
