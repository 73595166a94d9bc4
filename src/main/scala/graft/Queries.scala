package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Tokenize
import graft.operators.JoinSearch
import graft.oracle.SearchOracle
import graft.oracle.SearchOracle.QuerySpec
import graft.sources.IndexBuilder

/** One registered query: a Spark implementation plus (usually) an
  * equivalent DuckDB oracle SQL for the driver's hash compare.
  *
  * `oracle` is the usual static SQL over the corpus tables. The rare
  * oracle that must read a DURABLE ARTIFACT (a parquet path derived
  * from the corpus dir — e.g. the production tokenizer's segments
  * table, whose 8192-merge training cannot unroll as CTEs) supplies
  * `oracleOf` instead: a `dir => sql` the Verify dump resolves
  * against the actual sf dir, so the emitted `oracle_sql.json` still
  * holds plain runnable SQL.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleOf: Option[String => String] = None) {
  def oracleFor(dir: String): Option[String] =
    oracleOf.map(_(dir)).orElse(oracle)
}

/** Registry of the reference-surface queries (SURVEY §2 inventory).
  * Extension modules (dedup / similarity / text / events / multimodal)
  * contribute their own lists; [[SparkEntry]] concatenates all.
  */
object Queries {

  // ---- deterministic query-table specs (scale-proportional samples) ----

  val customerCols = Seq("c_name", "c_mktsegment")
  val customerSpec = QuerySpec(
    "SELECT c_name, c_mktsegment FROM customer WHERE c_custkey % 15 = 1",
    customerCols)
  def customerQuery(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/customer.parquet").where("c_custkey % 15 = 1")

  val ordersCols = Seq("o_orderstatus", "o_orderpriority")
  val ordersSpec = QuerySpec(
    "SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 100 = 1",
    ordersCols)
  def ordersQuery(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet").where("o_orderkey % 100 = 1")

  val partCols = Seq("p_name", "p_brand", "p_type")
  val partSpec = QuerySpec(
    "SELECT p_name, p_brand, p_type FROM part WHERE p_partkey % 20 = 1",
    partCols)
  def partQuery(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/part.parquet").where("p_partkey % 20 = 1")

  // FIVE-attribute conjunction (round-15 verdict #7: the search is
  // proven at N=2/3; the count-filter / top-N / anchor arithmetic is
  // where an N>3 off-by-one would hide). No base table carries five
  // text columns, so the query table joins part x orders on key
  // equality — five attributes, scale-proportional rows (the
  // synthetic orderkeys are dense, so every sampled part pairs).
  val fiveCols = Seq("p_name", "p_brand", "p_type",
    "o_orderstatus", "o_orderpriority")
  val fiveSpec = QuerySpec(
    "SELECT p_name, p_brand, p_type, o_orderstatus, o_orderpriority " +
      "FROM part JOIN orders ON o_orderkey = p_partkey WHERE p_partkey % 40 = 1",
    fiveCols)
  def fiveQuery(s: SparkSession, dir: String): DataFrame = {
    val p = s.read.parquet(s"$dir/part.parquet").where("p_partkey % 40 = 1")
    val o = s.read.parquet(s"$dir/orders.parquet")
    p.join(o, p("p_partkey") === o("o_orderkey"))
      .select("p_name", "p_brand", "p_type", "o_orderstatus", "o_orderpriority")
  }

  // NONEMPTY N=5 conjunction (round-16 verdict #4): search_5attr_
  // tables pins the N=5 PLAN but is structurally empty here — no
  // catalog table carries five text columns, so no corpus row can
  // match five distinct keys. The DENORMALIZED WIDE VIEW — each
  // order joined to its customer's market segment, nation and
  // region — IS a corpus row with five text cells (the star-schema
  // flattening a warehouse search would index), so the same
  // conjunction / top-N / seq-parity arithmetic runs NONEMPTY and
  // oracle-gated end to end on every surface (sf gates, scaled
  // lakes, degenerate lake). The derived index shares the posting
  // semantics verbatim via IndexBuilder.unpivotRows/postingsFromRaw
  // (an ad-hoc catalog row, id 10 — NOT added to Corpus.tables, so
  // main-index snapshots and every existing oracle are untouched);
  // the oracle shares the cleaning chain via
  // SearchOracle.indexCtesOver.
  val wideCols = Seq("o_orderstatus", "o_orderpriority", "c_mktsegment",
    "n_name", "r_name")
  private val wideJoinSql =
    "FROM orders JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey"
  val wideTable = graft.sources.Corpus.Table(
    "orders_wide", 10, wideCols, "cast(o_orderkey as bigint)")
  // % 401 = 7: scale-proportional sample, ~0.25% of orders — wide
  // tuples are categorical (status x priority x segment x nation),
  // so each query row matches many wide rows: genuinely nonzero
  // count-filter/top-N legs at N=5.
  val wideSpec = QuerySpec(
    s"SELECT ${wideCols.mkString(", ")} $wideJoinSql WHERE o_orderkey % 401 = 7",
    wideCols)
  val wideIdxCtes: String = SearchOracle.indexCtesOver(
    wideCols.zipWithIndex.map { case (c, i) =>
      s"""SELECT cast("$c" as varchar) AS raw, ${wideTable.id} AS table_id, ${i + 1} AS column_id, cast(o_orderkey as bigint) AS row_id $wideJoinSql"""
    }.mkString("\n    UNION ALL "))

  def wideView(s: SparkSession, dir: String): DataFrame =
    // session-persisted (round-17 optimization): THREE registered
    // consumers share this flattening — the derived wide index build
    // and both wide5 queries' query-table derivations — and without
    // the persist each search re-ran the orders |X| customer shuffle
    // join (the dominant cost of both wide5 queries: ~3 s each at
    // sf0.1) once per broadcast subtree per invocation. Same pattern
    // as the shingle/band lineages; first touch pays the join once
    // per session.
    sources.DfCache.getOrPersist(s, s"wideview:$dir",
      Seq(s"$dir/orders.parquet", s"$dir/customer.parquet",
        s"$dir/nation.parquet", s"$dir/region.parquet")) {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      val n = s.read.parquet(s"$dir/nation.parquet")
      val r = s.read.parquet(s"$dir/region.parquet")
      // nation/region broadcast (tiny dims); orders |X| customer is
      // the one real shuffle join — exactly how the flattening runs
      // at scale.
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select((col("o_orderkey") +: wideCols.map(col)): _*)
    }

  def wideQuery(s: SparkSession, dir: String): DataFrame =
    wideView(s, dir).where("o_orderkey % 401 = 7")
      .select(wideCols.map(col): _*)

  /** Live derived index over the wide view — session-cached like the
    * other live index surfaces (rebuilt per corpus, never snapshot).
    */
  private def wideIndex(s: SparkSession, dir: String): DataFrame =
    // clustered by (table_id, row_id) like IndexBuilder.cached
    // (round-17): the conjunction aggregates in place, exchange-free.
    sources.DfCache.getOrPersist(s, s"wideidx:$dir")(
      IndexBuilder.postingsFromRaw(
        IndexBuilder.unpivotRows(wideView(s, dir), wideTable))
        .repartition(col("table_id"), col("row_id")))

  // keys exist in the corpus but never co-occur in one row -> empty.
  val negativeCols = Seq("n_name", "r_name")
  val negativeSpec = QuerySpec(
    "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey",
    negativeCols)
  def negativeQuery(s: SparkSession, dir: String): DataFrame = {
    val n = s.read.parquet(s"$dir/nation.parquet")
    val r = s.read.parquet(s"$dir/region.parquet")
    n.join(r, n("n_regionkey") === r("r_regionkey")).select("n_name", "r_name")
  }

  private def index(s: SparkSession, dir: String): DataFrame =
    IndexBuilder.cached(s, dir)

  private def maps(s: SparkSession, dir: String): DataFrame =
    JoinSearch.mappings(
      JoinSearch.prepareInput(customerQuery(s, dir), customerCols), customerCols)

  // ---- F1: tokenizer parity (the everything-depends-on-it op) ----

  private val f1 = Seq(
    Q("f1_clean_customer",
      (s, dir) => s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").cast("long").as("id"),
          Tokenize.clean(col("c_name")).as("cleaned"))
        .orderBy("id"),
      Some(s"""SELECT cast(c_custkey as bigint) AS id, ${Tokenize.cleanSql("c_name")} AS cleaned FROM customer ORDER BY id""")),
    Q("f1_clean_part",
      (s, dir) => s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").cast("long").as("id"),
          Tokenize.clean(concat_ws(" ", col("p_name"), col("p_brand"), col("p_type"))).as("cleaned"))
        .orderBy("id"),
      // concat_ws in BOTH engines: `||` is null-propagating in DuckDB
      // while Spark's concat_ws null-skips (round-2 ADVICE).
      Some(s"""SELECT cast(p_partkey as bigint) AS id, ${Tokenize.cleanSql("concat_ws(' ', p_name, p_brand, p_type)")} AS cleaned FROM part ORDER BY id""")),
    Q("f1_clean_documents",
      (s, dir) => s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("id"),
          Tokenize.clean(col("text")).as("cleaned"))
        .orderBy("id"),
      Some(s"""SELECT cast(doc_id as bigint) AS id, ${Tokenize.cleanSql("text")} AS cleaned FROM documents ORDER BY id""")))

  // ---- index build + probes (S3/S4/J5/U1) ----

  private val segKeys =
    Seq("building", "automobile", "machinery", "household", "furniture")

  private val indexQs = Seq(
    Q("idx_inverted_index",
      (s, dir) => index(s, dir).orderBy("table_id", "column_id", "row_id", "key"),
      Some(SearchOracle.indexOnly(
        "SELECT key, table_id, column_id, row_id FROM idxf ORDER BY table_id, column_id, row_id, key"))),
    Q("idx_snapshot_roundtrip",
      // S8/S9: force a fresh write + read through the snapshot's
      // physical path (key-clustered shuffle + parquet) and prove the
      // roundtrip loses nothing vs the index content. Sources the
      // session-persisted index rather than re-scanning the corpus —
      // the durability claim is about the write+read, not the build.
      (s, dir) => {
        val p = IndexBuilder.writeSnapshotAs(
          index(s, dir), IndexBuilder.snapshotPath(dir) + "-roundtrip")
        s.read.parquet(p)
          .orderBy("table_id", "column_id", "row_id", "key")
      },
      Some(SearchOracle.indexOnly(
        "SELECT key, table_id, column_id, row_id FROM idxf ORDER BY table_id, column_id, row_id, key"))),
    Q("idx_stream_delta_merge",
      // Batch twin of graft.streaming.IndexStream: a slice of the
      // postings plays the role of newly-arrived rows — written as a
      // key-clustered delta (the maintenance sink's exact physical
      // path), read back, and unioned with the base's complement.
      // The merged index must hash-match the full build.
      (s, dir) => {
        val newRows = col("table_id") === 2 && col("row_id") % 5 === 0
        val p = IndexBuilder.writeSnapshotAs(
          index(s, dir).where(newRows),
          IndexBuilder.snapshotPath(dir) + "-delta/batch=0")
        index(s, dir).where(!newRows)
          .unionByName(s.read.parquet(p))
          .orderBy("table_id", "column_id", "row_id", "key")
      },
      Some(SearchOracle.indexOnly(
        "SELECT key, table_id, column_id, row_id FROM idxf ORDER BY table_id, column_id, row_id, key"))),
    Q("s3_probe_inlist",
      (s, dir) => index(s, dir)
        .where(col("key").isin(segKeys: _*))
        .orderBy("table_id", "column_id", "row_id", "key"),
      Some(SearchOracle.indexOnly(
        s"""SELECT key, table_id, column_id, row_id FROM idxf WHERE key IN (${segKeys.map(k => s"'$k'").mkString(", ")}) ORDER BY table_id, column_id, row_id, key"""))),
    Q("s4_probe_equality",
      (s, dir) => index(s, dir)
        .where(col("key") === "1 urgent")
        .orderBy("table_id", "column_id", "row_id", "key"),
      Some(SearchOracle.indexOnly(
        "SELECT key, table_id, column_id, row_id FROM idxf WHERE key = '1 urgent' ORDER BY table_id, column_id, row_id, key"))),
    // ANALYZE-style index statistics: per-(table, column) posting
    // volume, key cardinality, and hottest-key df — the artifact a
    // planner (or the anchored conjunction's anchor choice) consults;
    // kdf aggregates once then rolls up, both levels map-side partial.
    Q("idx_column_profile",
      (s, dir) => index(s, dir)
        .groupBy("table_id", "column_id", "key")
        .agg(count(lit(1)).as("kdf"))
        .groupBy("table_id", "column_id")
        .agg(sum("kdf").cast("long").as("n_postings"),
          count(lit(1)).as("n_keys"),
          max("kdf").cast("long").as("max_key_df"))
        .orderBy("table_id", "column_id"),
      Some(SearchOracle.indexOnly(
        """SELECT table_id, column_id, CAST(sum(kdf) AS BIGINT) AS n_postings,
  count(*) AS n_keys, CAST(max(kdf) AS BIGINT) AS max_key_df
FROM (SELECT table_id, column_id, key, count(*) AS kdf
      FROM idxf GROUP BY table_id, column_id, key)
GROUP BY table_id, column_id ORDER BY table_id, column_id"""))),
    // Delta-varint packing accounting for the posting lists (the
    // classic inverted-index gap encoding), windowed — never a
    // per-key list materialization. The CASE-ladder byte count is
    // generated from one Scala constant so both engines share it.
    Q("idx_postings_packed",
      (s, dir) => sources.PostingsPack.packStats(IndexBuilder.cached(s, dir)),
      Some(SearchOracle.indexOnly {
        val ladder = (1 to 8)
          .map(k => s"WHEN d < ${1L << (7 * k)} THEN $k")
          .mkString(" ")
        s""", pd AS (
    SELECT table_id, column_id, key,
      row_id - coalesce(lag(row_id) OVER (
        PARTITION BY table_id, column_id, key ORDER BY row_id), 0) AS d
    FROM idxf
  ),
  pl AS (
    SELECT table_id, column_id, key, count(*) AS n,
      sum(CASE $ladder ELSE 9 END) AS bytes
    FROM pd GROUP BY table_id, column_id, key
  )
SELECT table_id, CAST(count(*) AS BIGINT) AS n_lists,
  CAST(sum(n) AS BIGINT) AS n_postings,
  CAST(8 * sum(n) AS BIGINT) AS raw_bytes,
  CAST(sum(bytes) AS BIGINT) AS packed_bytes,
  CAST(floor(10000 * (8 * sum(n) - sum(bytes)) / (8 * sum(n))) AS BIGINT) AS save_bp
FROM pl GROUP BY table_id ORDER BY table_id"""
      })),
    // The durable key-stats artifact (the snapshot's ANALYZE
    // companion): write-once, load-with-fallback, hash-matching the
    // straight per-key aggregation — proving the persisted statistic
    // IS the statistic the in-memory path computes.
    Q("idx_key_stats_artifact",
      (s, dir) => IndexBuilder.cachedKeyStats(s, dir).orderBy("key"),
      Some(SearchOracle.indexOnly(
        "SELECT key, count(*) AS kdf FROM idxf GROUP BY key ORDER BY key"))),
    // Batch twin of IndexStream.keyStatsWithDeltas: genuinely-new
    // postings (a shifted slice playing appended re-crawl rows) land
    // as a key-clustered delta; the INCREMENTALLY merged stats
    // (durable artifact + delta counts, no base re-scan) must
    // hash-match the oracle's from-scratch aggregation over
    // base ∪ delta — the statistic the delta-hot df cap consumes.
    Q("idx_live_key_stats",
      (s, dir) => {
        val newRows = index(s, dir)
          .where(col("table_id") === 2 && col("row_id") % 5 === 0)
          .withColumn("row_id", col("row_id") + lit(1000000000L))
        val deltaDir = IndexBuilder.snapshotPath(dir) + "-livedelta"
        IndexBuilder.writeSnapshotAs(newRows, s"$deltaDir/batch=0")
        // manifest-commit like the real maintainer (round 10): the
        // serve below resolves the DeltaLog manifest, putting the
        // manifest read path itself under the oracle gate.
        graft.streaming.DeltaLog.commit(s, deltaDir, "batch=0")
        graft.streaming.IndexStream.keyStatsWithDeltas(s, dir, deltaDir)
          .orderBy("key")
      },
      Some(SearchOracle.indexOnly(
        """, delta AS (
    SELECT key, table_id, column_id, CAST(row_id + 1000000000 AS BIGINT) AS row_id
    FROM idxf WHERE table_id = 2 AND row_id % 5 = 0
  ),
  live AS (SELECT * FROM idxf UNION ALL SELECT * FROM delta)
SELECT key, count(*) AS kdf FROM live GROUP BY key ORDER BY key"""))),
    // S4 generalized to real wildcards: the reference's probe template
    // is LIKE-shaped (handlers.py:73-83) but only ever receives
    // literals; this exercises the pattern form (ids 100-199 under the
    // 9-digit zero-pad). DuckDB LIKE has identical %/_ semantics.
    Q("s4_probe_like",
      (s, dir) => JoinSearch.probeLike(index(s, dir), "customer 0000001%")
        .orderBy("table_id", "column_id", "row_id", "key"),
      Some(SearchOracle.indexOnly(
        "SELECT key, table_id, column_id, row_id FROM idxf WHERE key LIKE 'customer 0000001%' ORDER BY table_id, column_id, row_id, key"))),
    Q("j5_semijoin_probe",
      (s, dir) => JoinSearch.probe(index(s, dir), maps(s, dir))
        .orderBy("table_id", "column_id", "row_id", "key"),
      Some(SearchOracle.stage(customerSpec,
        "SELECT key, table_id, column_id, row_id FROM postings ORDER BY table_id, column_id, row_id, key"))),
    Q("u1_union_per_column",
      (s, dir) => {
        val prep = JoinSearch.prepareInput(customerQuery(s, dir), customerCols)
        customerCols
          .map(c => index(s, dir).join(
            broadcast(prep.select(col(c).as("key")).distinct()), Seq("key"), "left_semi"))
          .reduce(_ unionByName _)
          .orderBy("key", "table_id", "column_id", "row_id")
      },
      Some(SearchOracle.stage(customerSpec,
        customerCols.map(c =>
          s"""SELECT key, table_id, column_id, row_id FROM idxf WHERE key IN (SELECT "$c" FROM qclean)""")
          .mkString("", "\nUNION ALL ", "\nORDER BY key, table_id, column_id, row_id")))))

  // ---- search pipeline stages (P/G/W/J/A on the customer query) ----

  private val stageQs = Seq(
    Q("p_prepare_input",
      (s, dir) => JoinSearch.prepareInput(customerQuery(s, dir), customerCols)
        .orderBy(customerCols.map(col): _*),
      Some(SearchOracle.stage(customerSpec,
        """SELECT "c_name", "c_mktsegment" FROM qclean ORDER BY "c_name", "c_mktsegment""""))),
    Q("g1_mappings_unpivot",
      (s, dir) => maps(s, dir).orderBy("key", "map_key"),
      Some(SearchOracle.stage(customerSpec,
        "SELECT key, map_key FROM maps ORDER BY key, map_key"))),
    Q("w1_cooccurrence_reduce",
      (s, dir) => JoinSearch.reduce(JoinSearch.probe(index(s, dir), maps(s, dir)), 2)
        .orderBy("table_id", "row_id", "key"),
      Some(SearchOracle.stage(customerSpec,
        "SELECT key, table_id, column_id, row_id FROM kept ORDER BY table_id, row_id, key"))),
    Q("j1_mapkey_join",
      (s, dir) => JoinSearch.joinMapped(
        JoinSearch.reduce(JoinSearch.probe(index(s, dir), maps(s, dir)), 2), maps(s, dir))
        .orderBy("table_id", "row_id", "key", "map_key"),
      Some(SearchOracle.stage(customerSpec,
        "SELECT key, table_id, column_id, row_id, map_key FROM mapped ORDER BY table_id, row_id, key, map_key"))),
    Q("w2_multiattr_matches",
      (s, dir) => JoinSearch.matches(JoinSearch.joinMapped(
        JoinSearch.reduce(JoinSearch.probe(index(s, dir), maps(s, dir)), 2), maps(s, dir)), 2)
        .orderBy("table_id", "row_id", "key", "map_key"),
      Some(SearchOracle.stage(customerSpec,
        "SELECT key, table_id, column_id, row_id, map_key FROM matches ORDER BY table_id, row_id, key, map_key"))),
    Q("a1_column_scores",
      (s, dir) => JoinSearch.columnScores(
        JoinSearch.matches(JoinSearch.joinMapped(
          JoinSearch.reduce(JoinSearch.probe(index(s, dir), maps(s, dir)), 2), maps(s, dir)), 2))
        .orderBy("table_id", "column_id"),
      Some(SearchOracle.stage(customerSpec,
        "SELECT table_id, column_id, join_score FROM col_scores ORDER BY table_id, column_id"))),
    Q("w3_top_columns",
      (s, dir) => JoinSearch.topColumns(JoinSearch.columnScores(
        JoinSearch.matches(JoinSearch.joinMapped(
          JoinSearch.reduce(JoinSearch.probe(index(s, dir), maps(s, dir)), 2), maps(s, dir)), 2)), 2)
        .orderBy("table_id", "column_id"),
      Some(SearchOracle.stage(customerSpec,
        "SELECT table_id, column_id, join_score FROM top_cols ORDER BY table_id, column_id"))))

  // ---- end-to-end searches ----

  private val searchQs = Seq(
    Q("search_customer_tables",
      (s, dir) => JoinSearch.searchTables(index(s, dir), customerQuery(s, dir), customerCols),
      Some(SearchOracle.tableScores(customerSpec))),
    Q("search_customer_columns",
      (s, dir) => JoinSearch.searchColumns(index(s, dir), customerQuery(s, dir), customerCols),
      Some(SearchOracle.columnScores(customerSpec))),
    Q("search_orders_tables",
      (s, dir) => JoinSearch.searchTables(index(s, dir), ordersQuery(s, dir), ordersCols),
      Some(SearchOracle.tableScores(ordersSpec))),
    Q("search_part_3attr",
      (s, dir) => JoinSearch.searchTables(index(s, dir), partQuery(s, dir), partCols),
      Some(SearchOracle.tableScores(partSpec))),
    // N=5 conjunction over the joined query table (round-15 verdict
    // #7): same anchored plan, five count-filter/top-N legs, on every
    // oracle surface. Structurally EMPTY on this corpus — no base
    // table carries five text columns, so no corpus row can match
    // five distinct keys (the `search_negative_no_cooccur` class:
    // emptiness is the asserted answer, hash-gated) — the NONEMPTY
    // N=5 arithmetic is pinned by `JoinSearchPropertySpec`'s
    // seven-strategy N=5 property over synthetic wide indexes.
    Q("search_5attr_tables",
      (s, dir) => JoinSearch.searchTables(index(s, dir), fiveQuery(s, dir), fiveCols),
      Some(SearchOracle.tableScores(fiveSpec))),
    // Seq-parity scoring mode on the 3-attribute query — the one
    // place A3 (top-2 column sum, Object.py:76-80) genuinely diverges
    // from the par-mode A2∘W3 (top-N sum), plus seq's top-30 bound.
    Q("search_part_seqparity",
      (s, dir) => JoinSearch.searchTablesSeqParity(index(s, dir), partQuery(s, dir), partCols),
      Some(SearchOracle.tableScoresSeqParity(partSpec))),
    Q("search_negative_no_cooccur",
      (s, dir) => JoinSearch.searchTables(index(s, dir), negativeQuery(s, dir), negativeCols),
      Some(SearchOracle.tableScores(negativeSpec))),
    // NONEMPTY N=5 (round-16 verdict #4): the denormalized wide view
    // (see wideView above) makes the five-leg conjunction arithmetic
    // produce real nonzero scores, oracle-gated — complementing
    // search_5attr_tables' hash-gated emptiness and the randomized
    // N=5 property.
    Q("search_wide5_tables",
      (s, dir) => JoinSearch.searchTables(wideIndex(s, dir), wideQuery(s, dir), wideCols),
      Some(SearchOracle.tableScoresOver(wideIdxCtes, wideSpec))),
    // Seq-parity (A3 top-2 column sum) at N=5 NONEMPTY: with five
    // populated column scores the top-2 selection actually discards
    // three legs — the arithmetic search_part_seqparity (N=3) can't
    // reach.
    Q("search_wide5_seqparity",
      (s, dir) => JoinSearch.searchTablesSeqParity(wideIndex(s, dir), wideQuery(s, dir), wideCols),
      Some(SearchOracle.tableScoresSeqParityOver(wideIdxCtes, wideSpec))),
    // Batched search service: three heterogeneous queries (2/2/3
    // attributes) answered in ONE index pass — the oracle runs them
    // one at a time, proving the shared-scan batching exact.
    Q("search_batch_queries",
      (s, dir) => JoinSearch.searchTablesBatch(index(s, dir), Seq(
        ("customer", customerQuery(s, dir), customerCols),
        ("orders", ordersQuery(s, dir), ordersCols),
        ("part", partQuery(s, dir), partCols))),
      Some(SearchOracle.tableScoresBatch(Seq(
        "customer" -> customerSpec,
        "orders" -> ordersSpec,
        "part" -> partSpec)))),
    // The engine's spark.sql surface: the whole search as ONE SQL
    // statement over temp views (F3/F4 done right) — same oracle.
    Q("sql_api_search",
      (s, dir) => operators.SqlSearch.searchTablesSql(
        s, index(s, dir), customerQuery(s, dir), customerCols),
      Some(SearchOracle.tableScores(customerSpec))),
    // The staged windowed pipeline end-to-end — the anchored default's
    // cross-check (same oracle, different physical strategy).
    Q("strategy_windowed",
      (s, dir) => JoinSearch.searchTablesWindowed(index(s, dir), customerQuery(s, dir), customerCols),
      Some(SearchOracle.tableScores(customerSpec))),
    Q("strategy_groupby_variant",
      (s, dir) => JoinSearch.searchTablesViaGroupBy(index(s, dir), customerQuery(s, dir), customerCols),
      Some(SearchOracle.tableScores(customerSpec))),
    // Row-wise / cell-wise strategies (Seq_Search.py:143-166): same
    // oracle as the col-wise pipeline — they are exact cross-checks.
    Q("strategy_rowwise",
      (s, dir) => JoinSearch.searchTablesRowWise(index(s, dir), customerQuery(s, dir), customerCols),
      Some(SearchOracle.tableScores(customerSpec))),
    Q("strategy_cellwise",
      (s, dir) => JoinSearch.searchTablesCellWise(index(s, dir), customerQuery(s, dir), customerCols),
      Some(SearchOracle.tableScores(customerSpec))),
    // Hint-free degradation form (lines=0 / huge-query posture):
    // Catalyst owns every join strategy. Same oracle.
    Q("strategy_shuffled",
      (s, dir) => JoinSearch.searchTablesShuffled(index(s, dir), customerQuery(s, dir), customerCols),
      Some(SearchOracle.tableScores(customerSpec))),
    // the size-gated dispatch between the two (round-8): small query
    // -> hinted broadcasts, over-threshold query -> degradation form.
    // Same oracle; JoinSearchSpec pins the routing itself.
    Q("strategy_auto",
      (s, dir) => JoinSearch.searchTablesAuto(index(s, dir), customerQuery(s, dir), customerCols),
      Some(SearchOracle.tableScores(customerSpec))),
    // Hot-key guard: status keys 'o'/'f' are degenerate CROSS-TABLE —
    // orders carries ~5k each but lineitem's l_linestatus adds ~30k,
    // so their global df is ~35k. The 10000 cap (at sf0.01) drops
    // them while keeping 'p' (df 5088, orders-only) and the
    // priorities (~3k): a partial, re-ranked result that exercises
    // the cap without zeroing the conjunction. (A fixed absolute cap
    // is scale-relative by nature; production would set it as a
    // corpus fraction.)
    Q("search_orders_dfcap",
      (s, dir) => JoinSearch.searchTablesCapped(index(s, dir), ordersQuery(s, dir), ordersCols, 10000L),
      Some(SearchOracle.tableScoresCapped(ordersSpec, 10000L))),
    // The FRACTION default (round-14 verdict #4): cap = 5 % of total
    // postings, derived from the key-stats the guard already reads —
    // scale-INVARIANT where the absolute cap above is scale-relative
    // (at sf0.01 it lands at ~9 k: drops the ~19 % status keys, keeps
    // 'p' at 2.8 % and the priorities at ~1.7 %; the ratios — and so
    // the behavior — are identical at sf0.1 and at 100 TB).
    Q("search_orders_dfcap_frac",
      (s, dir) => JoinSearch.searchTablesCapped(index(s, dir), ordersQuery(s, dir), ordersCols),
      Some(SearchOracle.tableScoresCappedFraction(
        ordersSpec, JoinSearch.DefaultCapFractionBp))),
    // Sketch pre-filtered search: the table-pruning pre-filter is
    // provably conservative, so ALL pruned forms hash against the
    // UNPRUNED oracles — the equality is the point. The part query
    // exercises colCount=3 breadth pruning. Since round 8 the default
    // pruned form runs against the table_id-PARTITIONED snapshot
    // (hive layout): the sketch verdict becomes a literal partition
    // predicate, so pruned tables' FILES are skipped, not just their
    // postings (PrunedSearchSpec pins PartitionFilters + files-read).
    Q("search_pruned_tables",
      (s, dir) => JoinSearch.searchTablesPartitionPruned(
        IndexBuilder.loadOrSnapshotPartitioned(s, dir),
        IndexBuilder.cachedTableSketch(s, dir),
        IndexBuilder.cachedKeyStats(s, dir),
        customerQuery(s, dir), customerCols),
      Some(SearchOracle.tableScores(customerSpec))),
    Q("search_part_pruned",
      (s, dir) => JoinSearch.searchTablesPartitionPruned(
        IndexBuilder.loadOrSnapshotPartitioned(s, dir),
        IndexBuilder.cachedTableSketch(s, dir),
        IndexBuilder.cachedKeyStats(s, dir),
        partQuery(s, dir), partCols),
      Some(SearchOracle.tableScores(partSpec))),
    // the merged-snapshot semi-join form stays registered as the
    // cross-check twin (same oracle): the prune that shrinks postings
    // when the index is one dataset and partition routing is not
    // available (e.g. the session-cached in-memory index).
    Q("search_pruned_semijoin",
      (s, dir) => JoinSearch.searchTablesPruned(index(s, dir), customerQuery(s, dir), customerCols),
      Some(SearchOracle.tableScores(customerSpec))),
    // batching + file skipping composed: three queries, one shared
    // probe, one unioned partition predicate. Oracle = the queries
    // one at a time, proving both accelerations exact together.
    Q("search_batch_pruned",
      (s, dir) => JoinSearch.searchTablesBatchPartitionPruned(
        IndexBuilder.loadOrSnapshotPartitioned(s, dir),
        IndexBuilder.cachedTableSketch(s, dir),
        IndexBuilder.cachedKeyStats(s, dir),
        Seq(
          ("customer", customerQuery(s, dir), customerCols),
          ("orders", ordersQuery(s, dir), ordersCols),
          ("part", partQuery(s, dir), partCols))),
      Some(SearchOracle.tableScoresBatch(Seq(
        "customer" -> customerSpec,
        "orders" -> ordersSpec,
        "part" -> partSpec)))))

  // ---- S1/S2 CSV source + P2 row limit ----

  /** Raw-column ORDER BY ... LIMIT for the deterministic P2 knob —
    * NULLS FIRST mirrors Spark's asc default (customer has no nulls;
    * the clause is there so the semantics is pinned, not lucky).
    */
  private val limitedSpec = QuerySpec(
    """SELECT c_name, c_mktsegment FROM customer WHERE c_custkey % 15 = 1
ORDER BY c_name NULLS FIRST, c_mktsegment NULLS FIRST LIMIT 7""",
    customerCols)

  /** One-time fixture write for the non-parquet source roundtrips:
    * skip when a committed dataset already sits at `path`. Re-writing
    * per invocation (a) put the write inside the timed query (the
    * round-5 csv/json bench regressions) and (b) broke [[DfCache]] —
    * the cached DataFrame's file listing snapshots at first read, so
    * an overwrite's fresh random part filenames turn any evicted-block
    * re-scan into FileNotFoundException (round-5 ADVICE).
    */
  private[graft] def fixtureOnce(path: String)(write: => Unit): Unit =
    if (!new java.io.File(path, "_SUCCESS").exists()) write

  /** Fixture path for `kind`, stamped with the source table's mtime:
    * a regenerated corpus at the same sf dir invalidates the fixture
    * automatically instead of silently serving stale query rows
    * against a fresh oracle. Package-visible so every fixture-writing
    * registry (e.g. [[MmQueries]]' blobs) shares ONE stamping/guard
    * convention instead of re-deriving it (round-8 self-review).
    */
  private[graft] def fixturePath(kind: String, dir: String,
      stampTable: String = "customer"): String = {
    val name = new java.io.File(dir).getName
    val stamp = new java.io.File(s"$dir/$stampTable.parquet").lastModified()
    s"${sys.props("user.dir")}/target/graft-$kind/$name-$stamp"
  }

  private val queryColSchema = org.apache.spark.sql.types.StructType(
    customerCols.map(c => org.apache.spark.sql.types.StructField(
      c, org.apache.spark.sql.types.StringType)))

  private val sourceQs = Seq(
    Q("csv_source_search",
      (s, dir) => {
        val path = fixturePath("csv", dir)
        fixtureOnce(path)(sources.CsvSource.write(
          customerQuery(s, dir).select(customerCols.map(col): _*), path))
        // the query table feeds several broadcast subtrees; persist
        // the (tiny) CSV read so it parses once, not once per join.
        val csvQ = sources.DfCache.getOrPersist(s, s"csvq:$path")(
          sources.CsvSource.read(s, path, queryColSchema))
        JoinSearch.searchTables(index(s, dir), csvQ, customerCols)
      },
      Some(SearchOracle.tableScores(customerSpec))),
    Q("json_source_search",
      (s, dir) => {
        val path = fixturePath("json", dir)
        fixtureOnce(path)(sources.JsonSource.write(
          customerQuery(s, dir).select(customerCols.map(col): _*), path))
        val jsonQ = sources.DfCache.getOrPersist(s, s"jsonq:$path")(
          sources.JsonSource.read(s, path, queryColSchema))
        JoinSearch.searchTables(index(s, dir), jsonQ, customerCols)
      },
      Some(SearchOracle.tableScores(customerSpec))),
    // Columnar non-parquet source: the same search from an ORC
    // roundtrip of the query table (schema-preserving, splittable —
    // the other columnar format a lake commonly carries). The oracle
    // checks the search RESULT, which is format-independent.
    Q("orc_source_search",
      (s, dir) => {
        val path = fixturePath("orc", dir)
        fixtureOnce(path)(customerQuery(s, dir).select(customerCols.map(col): _*)
          .write.mode("overwrite").orc(path))
        val orcQ = sources.DfCache.getOrPersist(s, s"orcq:$path")(s.read.orc(path))
        JoinSearch.searchTables(index(s, dir), orcQ, customerCols)
      },
      Some(SearchOracle.tableScores(customerSpec))),
    // URL ingestion — the reference's only ingress (main.py:6 fetches
    // the query CSV over HTTP; Par_Search.py:147 addFile(url)). The
    // fixture is a single CSV file served through a file:// URL (the
    // sandbox-safe stand-in; addFile handles http/https identically)
    // and must produce the exact customer-search result.
    Q("url_source_search",
      (s, dir) => {
        val path = fixturePath("url", dir)
        fixtureOnce(path)(customerQuery(s, dir).select(customerCols.map(col): _*)
          .coalesce(1).write.mode("overwrite").option("header", "true").csv(path))
        val part = new java.io.File(path).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
          .minBy(_.getName)
        val urlQ = sources.DfCache.getOrPersist(s, s"urlq:$path")(
          sources.CsvSource.readUrl(s, part.toURI.toString, queryColSchema))
        JoinSearch.searchTables(index(s, dir), urlQ, customerCols)
      },
      Some(SearchOracle.tableScores(customerSpec))),
    Q("p_prepare_input_limited",
      (s, dir) => JoinSearch.prepareInput(customerQuery(s, dir), customerCols, Some(7))
        .orderBy(customerCols.map(col): _*),
      Some(SearchOracle.stage(limitedSpec,
        """SELECT "c_name", "c_mktsegment" FROM qclean ORDER BY "c_name", "c_mktsegment""""))),
    // Salted two-stage aggregation is result-invariant, so the oracle
    // is the plain GROUP BY — parity proves the de-skew rewrite safe.
    Q("idx_key_df_salted",
      (s, dir) => operators.Skew.saltedKeyCounts(index(s, dir)),
      Some(SearchOracle.indexOnly(
        """SELECT key, count(*) AS df FROM idxf GROUP BY key ORDER BY df DESC, key ASC LIMIT 20"""))))

  // ---- J3/J4: (table,row) self-join for one key pair ----

  // Key pair verified to co-occur in one (table,row) at every sf:
  // customer 33's segment is HOUSEHOLD at sf0.001/0.01/0.1, so
  // ('customer 000000033', 'household') share (customer, row 33) and
  // the self-join is exercised on nonzero rows (round-2 VERDICT #6).
  private val selfJoinQs = Seq(
    Q("j3_j4_selfjoin_pair",
      (s, dir) => {
        val idx = index(s, dir)
        def side(k: String, kn: String, cn: String) = idx.where(col("key") === k)
          .dropDuplicates()
          .select(col("table_id"), col("row_id"),
            col("key").as(kn), col("column_id").as(cn))
        side("customer 000000033", "key_x", "col_x")
          .join(side("household", "key_y", "col_y"), Seq("table_id", "row_id"))
          .select("table_id", "key_x", "col_x", "row_id", "key_y", "col_y")
          .orderBy("table_id", "row_id", "col_x", "col_y")
      },
      Some(SearchOracle.indexOnly(
        """SELECT x.table_id, x.key AS key_x, x.column_id AS col_x, x.row_id, y.key AS key_y, y.column_id AS col_y
FROM (SELECT DISTINCT key, table_id, column_id, row_id FROM idxf WHERE key = 'customer 000000033') x
JOIN (SELECT DISTINCT key, table_id, column_id, row_id FROM idxf WHERE key = 'household') y
  ON x.table_id = y.table_id AND x.row_id = y.row_id
ORDER BY x.table_id, x.row_id, col_x, col_y"""))))

  // ---- general relational surface (agg / join / window, exact
  //      integer arithmetic via cents-as-bigint for float parity) ----

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast("long")

  private val relationalQs = Seq(
    Q("q1_pricing_summary",
      (s, dir) => s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_quantity"))).cast("long").as("qty_cents"),
          sum(cents(col("l_extendedprice"))).cast("long").as("price_cents"),
          sum(cents(col("l_discount"))).cast("long").as("disc_cents"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
cast(sum(cast(round(l_quantity*100) as bigint)) as bigint) AS qty_cents,
cast(sum(cast(round(l_extendedprice*100) as bigint)) as bigint) AS price_cents,
cast(sum(cast(round(l_discount*100) as bigint)) as bigint) AS disc_cents
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),
    Q("q3_building_revenue",
      (s, dir) => {
        val c = s.read.parquet(s"$dir/customer.parquet").where(col("c_mktsegment") === "BUILDING")
        val o = s.read.parquet(s"$dir/orders.parquet")
        val l = s.read.parquet(s"$dir/lineitem.parquet")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(o("o_orderkey").as("o_orderkey"))
          .agg(sum(cents(l("l_extendedprice") * (lit(1) - l("l_discount")))).cast("long").as("revenue_cents"),
            count(lit(1)).as("n"))
          .orderBy(col("revenue_cents").desc, col("o_orderkey").asc)
          .limit(100)
      },
      Some("""SELECT o_orderkey, cast(sum(cast(round(l_extendedprice*(1-l_discount)*100) as bigint)) as bigint) AS revenue_cents, count(*) AS n
FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey ORDER BY revenue_cents DESC, o_orderkey ASC LIMIT 100""")),
    Q("window_running_order_total",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("rn"),
            sum(cents(col("o_totalprice")))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("long").as("running_cents"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
cast(sum(cast(round(o_totalprice*100) as bigint)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) as bigint) AS running_cents
FROM orders ORDER BY o_custkey, o_orderkey""")),
    // Filter-heavy aggregate whose range predicates all push to the
    // parquet scan (PushdownSpec asserts PushedFilters non-empty):
    // forecast-revenue shape over lineitem.
    Q("q6_forecast_revenue",
      (s, dir) => s.read.parquet(s"$dir/lineitem.parquet")
        .where(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice") * col("l_discount")))
            .cast("long").as("revenue_cents"),
          count(lit(1)).as("n")),
      Some("""SELECT cast(sum(cast(round(l_extendedprice*l_discount*100) as bigint)) as bigint) AS revenue_cents, count(*) AS n
FROM lineitem WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""")),
    // TPC-H Q18 shape (large-volume customer): semi-aggregated
    // lineitem qty feeds a broadcast-able filter of orders — the
    // classic aggregate-then-join that must NOT join first (joining
    // 3 tables then filtering would shuffle the whole lineitem x
    // order product). Threshold 250 sized to the synthetic SF.
    // TPC-H Q5 (local supplier volume): the 6-way join shape whose
    // planning is the point — region/nation are broadcast dims, the
    // customer-supplier CO-LOCATION condition (c_nationkey =
    // s_nationkey) rides the lineitem↔supplier join as a residual,
    // and the date filter prunes orders before anything wide. One
    // corpus-sized lineage (lineitem), everything else broadcast or
    // pre-filtered — the plan a 100 TB fact table needs.
    Q("q5_local_supplier_volume",
      (s, dir) => {
        val asiaNations = s.read.parquet(s"$dir/nation.parquet")
          .join(s.read.parquet(s"$dir/region.parquet")
            .where(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val c = s.read.parquet(s"$dir/customer.parquet")
          .select("c_custkey", "c_nationkey")
        val o = s.read.parquet(s"$dir/orders.parquet")
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val sup = s.read.parquet(s"$dir/supplier.parquet")
          .select("s_suppkey", "s_nationkey")
        val l = s.read.parquet(s"$dir/lineitem.parquet")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
            c("c_nationkey") === sup("s_nationkey"))
          .join(broadcast(asiaNations),
            sup("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(cents(l("l_extendedprice") * (lit(1) - l("l_discount"))))
            .cast("long").as("revenue_cents"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("revenue_cents").desc, col("n_name").asc)
      },
      Some("""SELECT n_name,
  cast(sum(cast(round(l_extendedprice*(1-l_discount)*100) as bigint)) as bigint) AS revenue_cents,
  count(*) AS n_lines
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue_cents DESC, n_name ASC""")),
    Q("q18_large_volume_customer",
      (s, dir) => {
        val c = s.read.parquet(s"$dir/customer.parquet")
        val o = s.read.parquet(s"$dir/orders.parquet")
        val qty = s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"))
          .where(col("sum_qty") > 250)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(qty, o("o_orderkey") === qty("l_orderkey"))
          .select(c("c_name").as("c_name"), c("c_custkey").as("c_custkey"),
            o("o_orderkey").as("o_orderkey"),
            o("o_orderdate").as("o_orderdate"),
            cents(o("o_totalprice")).cast("long").as("o_totalprice_cents"),
            col("sum_qty"))
          .orderBy(col("o_totalprice_cents").desc, col("o_orderkey").asc)
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
  cast(round(o_totalprice*100) as bigint) AS o_totalprice_cents, sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN (SELECT l_orderkey, cast(sum(cast(l_quantity as bigint)) as bigint) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(cast(l_quantity as bigint)) > 250) q
  ON o_orderkey = q.l_orderkey
ORDER BY o_totalprice_cents DESC, o_orderkey ASC LIMIT 100""")),
    // TPC-H Q4 shape (order priority checking), adapted to the
    // synthetic schema (no commit/receipt dates): orders in a
    // quarter-ish window having SOME line shipped > 30 days after
    // the order date — a correlated EXISTS that must plan as a
    // LEFT SEMI join with a non-equi residual (never a join+distinct,
    // which would shuffle the full match multiplicity just to throw
    // it away). The date filter prunes the probe side BEFORE the
    // join; the semi-join stops at first match per order.
    Q("q4_order_priority",
      (s, dir) => {
        val o = s.read.parquet(s"$dir/orders.parquet")
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        val l = s.read.parquet(s"$dir/lineitem.parquet")
          .select("l_orderkey", "l_shipdate")
        o.join(l, o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority""")),
    // JSON scalar surface: events.props is a JSON string column.
    Q("events_props_json",
      (s, dir) => s.read.parquet(s"$dir/events.parquet")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").cast("long").as("sum_k"),
          min("k").cast("long").as("min_k"), max("k").cast("long").as("max_k"))
        .orderBy("event_type"),
      // `jk`: Spark's get_json_object is TOTAL over crawl-grade props
      // (malformed JSON, JSON null, missing key, NULL column all ->
      // SQL NULL); json_valid + TRY_CAST is the DuckDB spelling of
      // the same contract (a bare json_extract THROWS on malformed
      // input — found by the degenerate-lake hash gate, round 13).
      Some("""WITH e AS (SELECT event_type,
    CASE WHEN json_valid(props)
      THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS jk
  FROM events)
SELECT event_type, count(*) AS n,
CAST(sum(jk) AS BIGINT) AS sum_k,
CAST(min(jk) AS BIGINT) AS min_k,
CAST(max(jk) AS BIGINT) AS max_k
FROM e GROUP BY event_type ORDER BY event_type""")),
    // Date/time scalar surface: month-bucketed rollup (o_orderdate is
    // a millis timestamp; session timezone UTC in both engines).
    Q("orders_monthly_rollup",
      (s, dir) => s.read.parquet(s"$dir/orders.parquet")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).cast("long").as("total_cents"))
        .orderBy("y", "m"),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
count(*) AS n, cast(sum(cast(round(o_totalprice*100) as bigint)) as bigint) AS total_cents
FROM orders GROUP BY 1, 2 ORDER BY y, m""")),
    // Multi-dimensional aggregation surface (§2.4 breadth): one CUBE
    // pass produces all 4 (status x priority) grouping combinations —
    // Spark expands grouping sets inside a single shuffle (partial
    // aggregation per set), vs 4 separate scans+shuffles for the
    // UNION ALL formulation. grouping_id disambiguates subtotal rows
    // from genuine NULL keys; identical operator exists in DuckDB.
    Q("orders_status_priority_cube",
      (s, dir) => s.read.parquet(s"$dir/orders.parquet")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).cast("long").as("total_cents"))
        .select(col("gid"), col("o_orderstatus"), col("o_orderpriority"),
          col("n"), col("total_cents"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority"),
      Some("""SELECT CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
o_orderstatus, o_orderpriority, count(*) AS n,
cast(sum(cast(round(o_totalprice*100) as bigint)) as bigint) AS total_cents
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),
    // Full outer join (§2.3 breadth — the one join category with no
    // green query): daily order counts reconciled against daily event
    // counts; days present on either side survive with the other side
    // zero-filled. Compiles to one sort-merge full-outer over two
    // pre-aggregated (small) sides — both inputs shrink to day grain
    // BEFORE the join, so the shuffled frames are bounded by the
    // calendar, not the fact tables.
    Q("orders_events_daily_outer",
      (s, dir) => {
        val o = s.read.parquet(s"$dir/orders.parquet")
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(count(lit(1)).as("n_orders"))
        val e = operators.Events.nanos(s, dir)
          .groupBy(to_date(timestamp_micros(expr("ts div 1000"))).as("d"))
          .agg(count(lit(1)).as("n_events"))
        o.join(e, Seq("d"), "full_outer")
          .select(col("d").cast("string").as("d"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("n_events"), lit(0L)).as("n_events"))
          // counts as tiebreakers: a full-outer join keeps each
          // side's NULL-key rows SEPARATE, so "ORDER BY d" alone is
          // not total when both sides carry one (degenerate lake) —
          // an underdetermined sort hashes nondeterministically
          .orderBy("d", "n_orders", "n_events")
      },
      Some("""SELECT CAST(d AS VARCHAR) AS d,
  coalesce(n_orders, 0) AS n_orders, coalesce(n_events, 0) AS n_events
FROM (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
      FROM orders GROUP BY 1) o
FULL OUTER JOIN (SELECT CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS d,
      count(*) AS n_events FROM events GROUP BY 1) e USING (d)
ORDER BY d, coalesce(n_orders, 0), coalesce(n_events, 0)""")),
    // Range join (§2.3 breadth): band each event's value by [lo, hi)
    // containment against a tiny bands dimension. The scale shape is
    // a broadcast nested-loop join — the big side never shuffles and
    // streams once through 5 interval predicates; a shuffle-based
    // range join would be wrong here by construction. Bands are
    // half-open and cover the full domain, so the join is total
    // (row counts preserved).
    Q("events_value_banded",
      (s, dir) => {
        import s.implicits._
        val bands = broadcast(valueBands.toDF("band", "lo", "hi"))
        val e = s.read.parquet(s"$dir/events.parquet")
        e.join(bands, e("value") >= bands("lo") && e("value") < bands("hi"))
          .groupBy("band", "lo")
          .agg(count(lit(1)).as("n"), sum(cents(col("value"))).cast("long").as("value_cents"))
          .select(col("band"), col("n"), col("value_cents"))
          .orderBy("band")
      },
      Some(s"""WITH bands(band, lo, hi) AS (VALUES ${valueBands.map {
          case (b, lo, hi) => s"('$b', $lo, $hi)" }.mkString(", ")})
SELECT band, count(*) AS n,
cast(sum(cast(round(value*100) as bigint)) as bigint) AS value_cents
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY band ORDER BY band""")))

  /** Event-type vocabulary for the pivot (explicit value list: a
    * pivot without one triggers a driver-side distinct collection —
    * the wrong shape at scale, and nondeterministic column order).
    */
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  // Reshape breadth (§2.9): native pivot with a FIXED value list —
  // one shuffle on the grouping key, wide counts per event type.
  // The oracle is the equivalent conditional aggregation (DuckDB's
  // PIVOT sugar expands to exactly this).
  private val pivotQs = Seq(
    Q("events_user_type_pivot",
      (s, dir) => s.read.parquet(s"$dir/events.parquet")
        .groupBy((col("user_id") % 10).cast("long").as("user_bucket"))
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
        .na.fill(0L, eventTypes)
        .orderBy("user_bucket"),
      Some(s"""SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
${eventTypes.map(t => s"""CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS "$t"""").mkString(",\n")}
FROM events GROUP BY 1 ORDER BY user_bucket""")),
    // ntile quartiles (§2.5 window breadth): equal-height buckets per
    // status with a total tie-break order, rolled up to quartile
    // stats — ntile's bucket-boundary arithmetic is engine-identical
    // given the same total order.
    Q("orders_value_quartiles",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        s.read.parquet(s"$dir/orders.parquet")
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .groupBy("o_orderstatus", "quartile")
          .agg(count(lit(1)).as("n"),
            sum(cents(col("o_totalprice"))).cast("long").as("total_cents"))
          .orderBy("o_orderstatus", "quartile")
      },
      Some("""SELECT o_orderstatus, CAST(q AS BIGINT) AS quartile, count(*) AS n,
cast(sum(cast(round(o_totalprice*100) as bigint)) as bigint) AS total_cents
FROM (SELECT o_orderstatus, o_totalprice,
  ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC) AS q
  FROM orders)
GROUP BY o_orderstatus, q ORDER BY o_orderstatus, quartile""")),
    // Exact median (§2.5 window breadth) without percentile floats:
    // the double-row_number formula — median = mean of the one or two
    // middle-ranked values, kept integral by doubling (half-token
    // units), so both engines emit exact integers.
    Q("text_token_median_by_lang",
      (s, dir) => {
        val base = s.read.parquet(s"$dir/documents.parquet")
          .select(col("lang"), expr("size(split(trim(text), '\\\\s+'))").cast("long").as("n_tok"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("n_tok").asc)
        base
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("lang")))
          .where(col("rn") === expr("(cnt + 1) div 2") ||
            col("rn") === expr("cnt div 2 + 1"))
          .groupBy("lang")
          .agg(sum("n_tok").cast("long").as("median_2x_raw"),
            count(lit(1)).as("mid_n"))
          .select(col("lang"),
            (col("median_2x_raw") * lit(2) / col("mid_n")).cast("long").as("median_2x"))
          .orderBy("lang")
      },
      Some("""WITH base AS (
  SELECT lang, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
  FROM documents
),
ranked AS (
  SELECT lang, n_tok,
    row_number() OVER (PARTITION BY lang ORDER BY n_tok ASC) AS rn,
    count(*) OVER (PARTITION BY lang) AS cnt
  FROM base
)
SELECT lang,
  CAST(sum(n_tok) * 2 / count(*) AS BIGINT) AS median_2x
FROM ranked
WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
GROUP BY lang ORDER BY lang"""))
  )

  /** Set-operation breadth (§2.7): EXCEPT compiles to a distributed
    * left-anti hash join (broadcast-able small side under AQE) — the
    * scale form of "ids in A, absent from B". Customers who placed
    * orders but never produced an event.
    */
  private val setOpQs = Seq(
    Q("custkeys_without_events",
      (s, dir) => {
        val o = s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_custkey").as("id")).distinct()
        val e = s.read.parquet(s"$dir/events.parquet")
          .select(col("user_id").as("id")).distinct()
        o.except(e).orderBy("id")
      },
      Some("""SELECT DISTINCT o_custkey AS id FROM orders
EXCEPT SELECT DISTINCT user_id AS id FROM events ORDER BY id""")))

  /** Half-open [lo, hi) value bands covering the whole double domain
    * (labels sort in band order for deterministic output).
    */
  private lazy val valueBands = Seq(
    ("b1_micro", 0.0, 1.0), ("b2_small", 1.0, 10.0), ("b3_mid", 10.0, 50.0),
    ("b4_large", 50.0, 200.0), ("b5_huge", 200.0, 1e18))

  /** All registered queries: reference surface + extension families. */
  val all: Seq[Q] =
    f1 ++ indexQs ++ stageQs ++ searchQs ++ selfJoinQs ++ relationalQs ++
      pivotQs ++ setOpQs ++ sourceQs ++ DedupQueries.all ++ SimQueries.all ++
      TextQueries.all ++ EventQueries.all ++ MmQueries.all ++ PrepQueries.all
}
