package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Tokenize

/** Builds the inverted index `(key, table_id, column_id, row_id)` —
  * the engine-native replacement for the reference's external Vertica
  * table `main_tokenized` (reference `handlers.py:15`,
  * `Par_Search.py:186-191`). One posting per non-empty cleaned cell.
  *
  * Scale posture:
  *  - one parquet scan per table (`stack` unpivots all indexed columns
  *    in a single pass — no per-column rescans);
  *  - cleaning is a single codegen'd static call applied once, after
  *    the unpivot ([[Tokenize.clean]]);
  *  - no global sort / window / collect anywhere; row ids derive from
  *    primary keys (see [[Corpus]]);
  *  - the index is a durable parquet snapshot (S8/S9, mirroring the
  *    reference's `-read`/`-write` parquet gating,
  *    `Par_Search.py:92-134`), written hash-clustered by `key` so a
  *    probe's matching keys co-locate in few files. On a cluster this
  *    becomes `bucketBy(key)` into a metastore-backed table so probe
  *    semi-joins skip the big-side shuffle entirely; the local
  *    in-memory catalog cannot persist bucket metadata across JVMs,
  *    so the snapshot records clustering physically only.
  *  - C2 (the reference's range pre-clustering of the main table,
  *    `Par_Search.py:226-242`) is deliberately DROPPED, by
  *    measurement (sf0.1, local[32], min of 3): probe on the
  *    hash-clustered cached index 0.66 s vs 0.67 s after
  *    `repartitionByRange(key)` — identical, because the probe is a
  *    broadcast semi-join and never shuffles the big side — while
  *    the range shuffle itself costs 1.9 s + a second persisted
  *    copy. Range clustering would only pay on a sort-merge probe
  *    path, which this engine never takes.
  */
object IndexBuilder {

  /** Semantics fingerprint of the snapshot's generating computation
    * (round-13, replacing the manual `FormatVersion` bump whose
    * failure mode round 12 proved: a seeding/admission change altered
    * artifact CONTENT under an unchanged source fingerprint, and only
    * a self-review remembered the bump). Any bytecode change to the
    * index build rule ([[IndexBuilder]]), the tokenizer
    * ([[Tokenize]]) or the catalog ([[Corpus]]) now auto-invalidates
    * every snapshot AND — via the snapshot's content listing —
    * every companion artifact keyed off [[snapshotPath]].
    */
  private[graft] lazy val semKey: String = Artifacts.classFingerprint(
    IndexBuilder.getClass, Tokenize.getClass, Corpus.getClass)

  /** Unpivot rows of one catalog table to the raw wire format
    * `(raw, table_id, column_id, row_id)`. Public so streaming
    * maintenance ([[graft.streaming.IndexStream]]) unpivots arriving
    * rows with the identical catalog semantics the batch build uses.
    */
  def unpivotRows(df: DataFrame, t: Corpus.Table): DataFrame = {
    val stackArgs = t.textCols.zipWithIndex
      .map { case (c, i) => s"${i + 1}, cast(`$c` as string)" }
      .mkString(", ")
    df.selectExpr(
      s"stack(${t.textCols.size}, $stackArgs) as (column_id, raw)",
      s"${t.id} as table_id",
      s"cast(${t.rowIdExpr} as bigint) as row_id")
  }

  /** Unpivot one corpus table to `(raw, table_id, column_id, row_id)`. */
  private def unpivot(spark: SparkSession, dir: String, t: Corpus.Table): DataFrame =
    unpivotRows(spark.read.parquet(s"$dir/${t.name}.parquet"), t)

  /** Raw unpivoted cells -> postings: drop nulls, clean, drop empties,
    * narrow the id types. The single definition of "what a posting
    * is", shared by the batch build and streaming delta maintenance.
    */
  def postingsFromRaw(raw: DataFrame): DataFrame =
    raw
      .where(col("raw").isNotNull)
      .select(
        Tokenize.clean(col("raw")).as("key"),
        col("table_id").cast("int").as("table_id"),
        col("column_id").cast("int").as("column_id"),
        col("row_id").cast("long").as("row_id"))
      .where(col("key") =!= "")

  /** The full inverted index over all corpus tables in `dir`. */
  def build(spark: SparkSession, dir: String): DataFrame =
    postingsFromRaw(
      Corpus.tables.map(unpivot(spark, dir, _)).reduce(_ unionByName _))

  /** Snapshot ROOT for a corpus dir: keyed by corpus name and a
    * fingerprint of (catalog, stopword list) for name-spacing.
    * Semantic invalidation does NOT live in the path anymore — the
    * versioned gate ([[Artifacts.loadOrBuildWith]]) stamps
    * ([[semKey]], corpus-content) per version under this root, so a
    * code change rebuilds IN PLACE (`v=N+1`) instead of abandoning a
    * dir per change, and a corpus rewrite at the same path (which
    * the old `_SUCCESS`-existence probe could never see) also
    * invalidates.
    */
  def snapshotPath(dir: String): String = {
    val fp = scala.util.hashing.MurmurHash3.stringHash(
      Corpus.tables.toString + Tokenize.Stopwords.toString)
    val name = new java.io.File(dir).getName
    val base = sys.env.getOrElse(
      "GRAFT_INDEX_DIR", s"${sys.props("user.dir")}/target/graft-index")
    s"$base/$name-${fp.toHexString}"
  }

  /** The corpus table datasets a snapshot derives from — the gate's
    * upstream fingerprint set.
    */
  private def corpusPaths(dir: String): Seq[String] =
    Corpus.tables.map(t => s"$dir/${t.name}.parquet")

  /** S9: write the index snapshot, hash-clustered by `key`, as the
    * next served version under [[snapshotPath]] (atomic swap — a
    * reader holding the previous version keeps its files for one
    * rebuild interval).
    */
  def writeSnapshot(spark: SparkSession, dir: String): String =
    publishSnapshot(spark, dir, build(spark, dir))

  /** Publish externally-produced postings (a streaming compaction's
    * base+delta fold, a pruning swap) as the next served version of
    * the snapshot. Stamped with the CURRENT (semantics, corpus)
    * fingerprint: the gate serves it until the corpus or the build
    * code actually move — the versioned-layout form of the old
    * "overwrite the snapshot path in place".
    */
  def publishSnapshot(spark: SparkSession, dir: String,
      postings: DataFrame): String =
    Artifacts.publish(spark, snapshotPath(dir), corpusPaths(dir), semKey)(
      t => writeSnapshotAs(postings, t))

  /** The snapshot's physical form, for any postings source: one
    * hash-cluster shuffle on `key` (matching keys co-locate in few
    * files) then parquet. Exposed so the durability roundtrip can
    * snapshot the already-persisted index without re-paying the
    * 7-table rescan, and so incremental maintenance can write delta
    * postings in the identical layout.
    */
  def writeSnapshotAs(postings: DataFrame, path: String): String = {
    postings
      .repartition(col("key"))
      .write.mode("overwrite").parquet(path)
    path
  }

  /** S8: load the snapshot if a FRESH version exists, else build +
    * publish + load. Mirrors the reference's read-with-fallback
    * (`Par_Search.py:92-99`), upgraded twice since: Hadoop-FS probing
    * (VERDICT r2 — `java.io.File` is local-only), and in round 13 the
    * full versioned gate — the old `_SUCCESS`-existence probe could
    * never see a corpus rewritten at the same path OR a changed build
    * rule, and served the stale snapshot forever.
    *
    * COST NOTE: the freshness check lists all corpus datasets
    * recursively per call (~10 LISTs on an object store), a
    * deliberate correctness-over-probe-cost default. The hot search
    * path amortizes it through [[cached]] (one check per session);
    * callers on a per-query path against an immutable corpus can
    * layer the same session memoization — what must NOT come back is
    * the existence-only probe this replaced.
    */
  def loadOrSnapshot(spark: SparkSession, dir: String): DataFrame =
    Artifacts.loadOrBuild(spark, snapshotPath(dir), corpusPaths(dir), semKey)(
      t => writeSnapshotAs(build(spark, dir), t))

  /** The lake-layout snapshot's location, beside the merged one
    * (shares its fingerprint, so semantic changes invalidate both).
    */
  def partitionedSnapshotPath(dir: String): String = snapshotPath(dir) + "-bytable"

  /** S9 at lake scale: the snapshot hive-partitioned by `table_id`,
    * key-clustered within each partition. This is the layout that
    * makes the sketch pre-filter's win PHYSICAL: a literal
    * `table_id IN (...)` predicate on this dataset lands in the
    * scan's PartitionFilters, so pruned tables' files are never
    * listed into the plan at all — the difference between touching
    * 100 TB and touching the handful of tables sharing the query's
    * vocabulary. (On the merged snapshot the same prune only shrinks
    * the probe output; every table's bytes are still read —
    * measured LOSING locally in round 7, SCALE.md.) Mirrors the
    * per-table reality of a data lake, where each table is its own
    * dataset and the "index" federates them.
    */
  def writePartitionedSnapshot(spark: SparkSession, dir: String): String =
    Artifacts.publish(spark, partitionedSnapshotPath(dir), corpusPaths(dir),
      semKey)(t => writePartitionedSnapshotAs(build(spark, dir), t))

  /** The lake layout for ANY postings source (the
    * [[writeSnapshotAs]] twin): hive-partitioned by `table_id`,
    * key-clustered within each partition. Exposed so streaming
    * compaction can fold base+deltas straight into the file-skipping
    * layout ([[graft.streaming.IndexStream.compactPartitioned]]).
    */
  def writePartitionedSnapshotAs(postings: DataFrame, path: String): String = {
    postings
      .repartition(col("key"))
      .write.mode("overwrite").partitionBy("table_id").parquet(path)
    path
  }

  /** S8 for the lake layout: load the partitioned snapshot if
    * present, else build + write + load. `table_id` comes back as a
    * partition column — same name, same int values, so every
    * downstream operator (all column-name-addressed) is layout-blind.
    */
  def loadOrSnapshotPartitioned(spark: SparkSession, dir: String): DataFrame =
    Artifacts.loadOrBuildWith(spark, partitionedSnapshotPath(dir),
      corpusPaths(dir), semKey)(
      t => writePartitionedSnapshotAs(build(spark, dir), t)) { p =>
      // EXPLICIT schema (data columns in file order, the partition
      // column last — the inferred layout): a partitionBy write of an
      // EMPTY postings frame emits `_SUCCESS` and no files at all, so
      // schema inference fails and a day-one/empty deployment crashed
      // every partition-pruned search (found by DegenerateLakeSpec).
      // With the schema supplied the empty dir reads as an empty
      // frame; a populated dir reads identically to inference.
      spark.read.schema(
          "key string, column_id int, row_id bigint, table_id int")
        .parquet(p)
    }

  /** S9 at cluster scale: the bucketed form of the snapshot. Writes
    * the index `bucketBy(numBuckets, "key")` as a catalog table, so
    * key-equi-joins (the probe, the J3 self-join, index-index
    * co-location) read both sides pre-hashed and skip the big-side
    * exchange entirely — the property [[snapshotPath]]'s plain
    * snapshot can only approximate physically. Local caveat: the
    * in-memory catalog keeps bucket metadata for the session only
    * (a cluster metastore keeps it forever); BucketedIndexSpec
    * asserts the no-exchange plan.
    */
  def writeBucketed(spark: SparkSession, dir: String,
      numBuckets: Int = 32, table: String = "graft_index_bucketed"): String = {
    build(spark, dir)
      .write.mode("overwrite")
      .bucketBy(numBuckets, "key")
      .sortBy("key")
      .option("path", s"${snapshotPath(dir)}-bucketed")
      .saveAsTable(table)
    table
  }

  /** One persisted index per (session, sfDir): Verify/Bench run many
    * queries against the same corpus — re-reading per query would
    * re-pay the scan.
    *
    * Persisted HASH-CLUSTERED BY (table_id, row_id) (round-17
    * optimization): the only per-query operation that re-keys the
    * big side anywhere in the search family is the conjunction's
    * per-row key-set aggregation on exactly (table_id, row_id) — and
    * an InMemoryRelation REPORTS its cached plan's partitioning
    * (AQE never re-plans cached subtrees by default —
    * `canChangeCachedPlanOutputPartitioning=false` — so the reported
    * HashPartitioning is stable), which means every searchTables /
    * seqparity / capped / batch / windowed conjunction now aggregates
    * IN PLACE with zero big-side exchange, the session-cache analog
    * of `bucketBy`. One repartition of the index at session first
    * touch (inside the separately-reported index_build pre-pay) buys
    * exchange-free probes for every query after. The probe itself
    * never cared about the old key clustering (it is a broadcast
    * semi-join; the durable snapshot stays key-clustered for scan
    * locality); the one regression surface is in-memory batch-stat
    * pruning for literal key probes (s3/s4), which trade a few
    * pruned batches for the search family's per-query shuffle.
    */
  def cached(spark: SparkSession, dir: String): DataFrame =
    // registered against the snapshot root AND the corpus tables: the
    // snapshot gate invalidates derived lineages by its UPSTREAM set
    // (the corpus paths) when it rebuilds, so a corpus rewritten
    // in-session must drop this entry too — its lineage points at the
    // superseded version dir.
    DfCache.getOrPersist(spark, s"index:$dir",
      snapshotPath(dir) +: corpusPaths(dir))(
      loadOrSnapshot(spark, dir)
        .repartition(col("table_id"), col("row_id")))

  /** The key-stats artifact's location, beside the snapshot (shares
    * its fingerprint, so semantic changes invalidate both together).
    */
  def keyStatsPath(dir: String): String = snapshotPath(dir) + "-stats"

  /** The durable ANALYZE companion of the snapshot: per-key posting
    * counts in the snapshot's own physical form
    * ([[writeSnapshotAs]] — key-clustered, so stat lookups for a
    * probe's keys touch few files). At 100 TB this is a
    * vocabulary-sized thin table whose single corpus pass amortizes
    * over every query ever run against the snapshot. The SESSION
    * path computes the same statistic in memory
    * ([[graft.operators.JoinSearch.indexKeyStats]], what
    * `searchTables` consumes); a cluster deployment loads this
    * artifact instead and hands it to the pipeline explicitly:
    * `conjunctionAnchored(probed, maps, n, Some(loadOrBuildKeyStats(
    * spark, dir)))` — the `stats` parameter exists for exactly that.
    *
    * Staleness: the artifact rebuilds whenever the snapshot's
    * `_SUCCESS` is NEWER than the stats' — a compaction or forced
    * re-snapshot at the same path invalidates the stats
    * automatically, not just the fingerprinted semantic changes.
    */
  def loadOrBuildKeyStats(spark: SparkSession, dir: String): DataFrame =
    loadOrBuildArtifact(spark, dir, keyStatsPath(dir),
      Artifacts.classFingerprint(IndexBuilder.getClass)) { t =>
      writeSnapshotAs(
        cached(spark, dir).groupBy("key").agg(count(lit(1)).as("kdf")), t)
    }

  /** The table-sketch artifact's location, beside the snapshot (same
    * fingerprint + staleness contract as the key stats).
    */
  def tableSketchPath(dir: String): String = snapshotPath(dir) + "-sketch"

  /** The durable form of [[graft.operators.JoinSearch.tableKeySketch]]
    * — the per-(table,column) distinct-key bucket sketch the search
    * pre-filter checks queries against. Like the key stats, a thin
    * build-time companion (#(table,column) rows × ≤4 KiB) whose one
    * aggregation pass amortizes over every query against the
    * snapshot; a cluster deployment loads this instead of
    * recomputing: `prunedTables(loadOrBuildTableSketch(spark, dir),
    * maps, n)`. No key clustering — the whole artifact is a handful
    * of rows read in one footprint.
    */
  def loadOrBuildTableSketch(spark: SparkSession, dir: String): DataFrame =
    loadOrBuildArtifact(spark, dir, tableSketchPath(dir),
      Artifacts.classFingerprint(
        IndexBuilder.getClass, graft.operators.JoinSearch.getClass)) { t =>
      graft.operators.JoinSearch.tableKeySketch(cached(spark, dir))
        .write.mode("overwrite").parquet(t)
    }

  /** Session-persisted reads of the two thin snapshot companions
    * (round-17 optimization): the partition-pruned search family
    * calls `loadOrBuild{KeyStats,TableSketch}` on EVERY query, and
    * each call re-pays the versioned gate's freshness probe (a
    * recursive content listing of the snapshot — the documented
    * "~10 LISTs on an object store" cost) plus parquet read planning,
    * for artifacts that are metadata-sized. These wrap the same gate
    * in the same once-per-session amortization [[cached]] already
    * gives the snapshot itself, registered against the snapshot root
    * + corpus paths so an in-session rebuild still invalidates
    * ([[DfCache.invalidateDerived]] — the gate drops derived
    * lineages before rebuilding).
    */
  def cachedKeyStats(spark: SparkSession, dir: String): DataFrame =
    DfCache.getOrPersist(spark, s"keystats-artifact:$dir",
      snapshotPath(dir) +: corpusPaths(dir))(loadOrBuildKeyStats(spark, dir))

  def cachedTableSketch(spark: SparkSession, dir: String): DataFrame =
    DfCache.getOrPersist(spark, s"sketch-artifact:$dir",
      snapshotPath(dir) +: corpusPaths(dir))(loadOrBuildTableSketch(spark, dir))

  /** Shared staleness gate for snapshot-companion artifacts: rebuild
    * whenever the snapshot's content listing changed since the
    * artifact was stamped — a compaction or forced re-snapshot at the
    * same root invalidates companions automatically (the snapshot's
    * own tokenizer/catalog semantics cascade the same way: a code
    * change rebuilds the snapshot, whose fresh listing invalidates
    * every companion). `semantics` therefore only needs the code
    * that maps SNAPSHOT -> ARTIFACT. Content-fingerprinted
    * ([[Artifacts]]), not mtime-compared: a rewrite landing within
    * one coarse mtime tick still invalidates (round-7 ADVICE).
    */
  private def loadOrBuildArtifact(spark: SparkSession, dir: String,
      path: String, semantics: String)(build: String => Unit): DataFrame =
    Artifacts.loadOrBuild(spark, path, Seq(snapshotPath(dir)), semantics)(build)
}
