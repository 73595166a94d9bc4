package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Tokenize

/** Builds the inverted index `(key, table_id, column_id, row_id)` —
  * the engine-native replacement for the reference's external Vertica
  * table `main_tokenized` (reference `handlers.py:15`,
  * `Par_Search.py:186-191`). One posting per non-empty cleaned cell.
  *
  * Scale posture:
  *  - one parquet scan per table (`stack` unpivots all indexed columns
  *    in a single pass — no per-column rescans);
  *  - cleaning is a single codegen'd expression applied once, after
  *    the unpivot;
  *  - no global sort / window / collect anywhere; row ids derive from
  *    primary keys (see [[Corpus]]);
  *  - the result is key-partitioned on write so probe semi-joins can
  *    prune shuffles.
  */
object IndexBuilder {

  /** Unpivot one corpus table to `(raw, table_id, column_id, row_id)`. */
  private def unpivot(spark: SparkSession, dir: String, t: Corpus.Table): DataFrame = {
    val df = spark.read.parquet(s"$dir/${t.name}.parquet")
    val stackArgs = t.textCols.zipWithIndex
      .map { case (c, i) => s"${i + 1}, cast(`$c` as string)" }
      .mkString(", ")
    df.selectExpr(
      s"stack(${t.textCols.size}, $stackArgs) as (column_id, raw)",
      s"${t.id} as table_id",
      s"cast(${t.rowIdExpr} as bigint) as row_id")
  }

  /** The full inverted index over all corpus tables in `dir`. */
  def build(spark: SparkSession, dir: String): DataFrame = {
    val parts = Corpus.tables.map(unpivot(spark, dir, _))
    parts.reduce(_ unionByName _)
      .where(col("raw").isNotNull)
      .select(
        Tokenize.clean(col("raw")).as("key"),
        col("table_id").cast("int").as("table_id"),
        col("column_id").cast("int").as("column_id"),
        col("row_id"))
      .where(col("key") =!= "")
  }

  // One cached (persisted) index per (session, sfDir): Verify/Bench
  // run many queries against the same corpus — rebuilding and
  // re-cleaning per query would dominate the benchmark.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  /** Cached index, persisted MEMORY_AND_DISK. */
  def cached(spark: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate(
      (System.identityHashCode(spark), dir),
      build(spark, dir).persist(StorageLevel.MEMORY_AND_DISK))
}
