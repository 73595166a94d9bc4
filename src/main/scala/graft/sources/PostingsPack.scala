package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Delta-varint accounting for the index's posting lists — the
  * classic inverted-index compression (sorted row ids per term →
  * gaps → LEB128 varints) sized EXACTLY, in portable integer
  * arithmetic, against the raw 8-byte-per-posting layout the
  * snapshot stores today. At 100 TB the postings ARE the index's
  * bytes: the snapshot's scan cost, cache footprint and shuffle
  * volume all divide by whatever this table says the gap encoding
  * buys (dense keys — a value repeated across consecutive rows —
  * approach 1 byte/posting vs 8).
  *
  * Shape: no per-key list is ever materialized (a `collect_list` per
  * term would be unbounded on hot keys — a stopword-like key holding
  * 10^8 postings at scale); gaps come from a `lag` window PARTITIONED
  * by the list key — the same key the snapshot layout already
  * clusters by ([[IndexBuilder.writeSnapshotAs]] repartitions on
  * `key`), so on the committed layout this window's exchange is the
  * one the snapshot write already paid. Duplicate row ids within a
  * list (the synthetic lineitem pk collides) delta to 0 regardless
  * of tie order, so the accounting is deterministic without a total
  * sort.
  *
  * The byte count is a pure CASE ladder on the gap (7 payload bits
  * per byte), identical in Spark and the DuckDB oracle, and
  * spec-pinned against a reference LEB128 encoder at the ladder
  * boundaries ([[graft.PostingsPackSpec]]), with the
  * reconstruction identity (prefix sums of gaps == sorted ids)
  * proven on the real corpus.
  */
object PostingsPack {

  /** LEB128 byte count of a non-negative long gap: 1 byte per 7
    * payload bits, 9 bytes max for 63-bit values.
    */
  def varintBytes(d: Column): Column = {
    val ladder = (1 to 8).foldLeft(when(lit(false), 0L)) { (acc, k) =>
      acc.when(d < (1L << (7 * k)), k.toLong)
    }
    ladder.otherwise(9L)
  }

  /** Per-table packing accounting over an index postings frame:
    * `(table_id, n_lists, n_postings, raw_bytes, packed_bytes,
    * save_bp)`.
    */
  def packStats(postings: DataFrame): DataFrame = {
    val w = Window.partitionBy("table_id", "column_id", "key").orderBy("row_id")
    val gaps = postings
      .withColumn("d",
        col("row_id") - coalesce(lag(col("row_id"), 1).over(w), lit(0L)))
    val lists = gaps
      .groupBy("table_id", "column_id", "key")
      .agg(count(lit(1)).as("n"), sum(varintBytes(col("d"))).as("bytes"))
    lists
      .groupBy("table_id")
      .agg(count(lit(1)).cast("long").as("n_lists"),
        sum("n").cast("long").as("n_postings"),
        (sum("n") * 8).cast("long").as("raw_bytes"),
        sum("bytes").cast("long").as("packed_bytes"))
      .withColumn("save_bp",
        floor(lit(10000L) * (col("raw_bytes") - col("packed_bytes")) /
          col("raw_bytes")).cast("long"))
      .orderBy("table_id")
  }
}
