package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two bucket
  * columns so that rows close in BOTH dimensions land close in ONE
  * sort order — the lakehouse multi-dimensional-layout primitive
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`) that makes 2-D range
  * predicates skip files and row groups, complementing the 1-D wins
  * the engine already has (table_id partition pruning for the index
  * lake, range-sorted postings).
  *
  * Why it matters at 100 TB: an event log written in arrival order
  * is perfectly clustered by time and perfectly SCATTERED by user —
  * a per-user query ("this user's events, ever") overlaps every row
  * group of every file, so min/max stats prune nothing and the query
  * reads the whole log. Z-ordering by (user bucket, hour bucket)
  * bounds both query shapes: a box predicate over u×t maps to a
  * small set of z ranges, so parquet row-group stats on the bucket
  * columns (or on z itself) skip the rest. `ZOrderSpec` proves the
  * mechanism on real parquet footers: the per-user box query touches
  * a strict subset of row groups under the z layout while the
  * time-sorted layout must open all of them.
  *
  * Everything is pure integer Column arithmetic (shifts, masks, or)
  * — whole-stage codegen, no UDF, and the DuckDB oracle replays the
  * interleave with multiply/add instead of shift/or (independent
  * formulation, same integers).
  */
object ZOrder {

  /** Bits kept per dimension (z fits in 2×16 = 32 bits of a long). */
  val Bits = 16

  private val Mask = (1L << Bits) - 1

  /** Morton interleave of the low [[Bits]] bits of two non-negative
    * bucket columns: result bit 2i is bit i of `x`, bit 2i+1 is bit
    * i of `y`. A fold of 2·Bits shift/mask/or terms — Catalyst
    * constant-folds the literals and codegen emits straight-line
    * long arithmetic.
    */
  def zValue(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Fixed-point normalization of `c` from [lo, hi] onto the full
    * [0, 2^Bits) coordinate space: `(c - lo) * (2^Bits - 1) div
    * max(hi - lo, 1)` — exact integer floor arithmetic, portable to
    * the oracle. WHY: interleaving RAW values gives a useless curve
    * when the dimensions' ranges are mismatched (150 user ids vs
    * hour indexes offset at ~14600 — the raw curve is time-major
    * because time's varying bits simply sit higher), so both
    * dimensions are first stretched to the same resolution; the
    * min/max come from one tiny stats aggregate, the pass a lake
    * already has in table statistics.
    */
  def normalize(c: Column, lo: Column, hi: Column): Column =
    call_function("div", (c - lo) * lit(Mask),
      greatest(hi - lo, lit(1L)))

  /** Attach per-dimension min/max (one tiny stats aggregate,
    * broadcast — never a driver collect) and the normalized-space z
    * value for frame `df`'s columns `xCol`, `yCol`.
    */
  private def withZ(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val stats = df.agg(
      min(xCol).as("__xlo"), max(xCol).as("__xhi"),
      min(yCol).as("__ylo"), max(yCol).as("__yhi"))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue(
        normalize(col(xCol), col("__xlo"), col("__xhi")),
        normalize(col(yCol), col("__ylo"), col("__yhi"))))
      .drop("__xlo", "__xhi", "__ylo", "__yhi")
  }

  /** Events with their 2-D bucket coordinates and z value:
    *  - `ub`: the user dimension (user_id masked to [[Bits]] bits);
    *  - `hb`: the time dimension (event-time hour index, floor
    *    division portable for any ts sign, masked to [[Bits]] bits —
    *    one mask window spans ~7.5 years, and the synthetic corpus
    *    sits inside one window; a production layout would subtract
    *    the partition's epoch instead of masking).
    * The z sort order this induces is what [[zOrderedWrite]]
    * persists; this frame is also the registered oracle query
    * (`events_zorder_map`) pinning the bit math row by row.
    */
  def zMap(spark: SparkSession, dir: String): DataFrame = {
    val nph = Events.NanosPerHour
    val base = Events.nanos(spark, dir)
      .select(col("event_id"),
        col("user_id").bitwiseAND(lit(Mask)).as("ub"),
        expr(s"(ts - ((ts % $nph + $nph) % $nph)) div $nph")
          .bitwiseAND(lit(Mask)).as("hb"))
    withZ(base, "ub", "hb")
      .withColumnRenamed("__z", "z")
      .orderBy("event_id")
  }

  /** Write `df` clustered by z over (`xCol`, `yCol`): ONE range
    * repartition on the z value (so files tile the z curve without
    * overlap across tasks), sortWithinPartitions for row-group-level
    * clustering, small parquet blocks so stats have resolution. At
    * lake scale this is the compaction job's write path — the sort
    * is per-partition (spillable), never a global driver-side sort.
    */
  def zOrderedWrite(df: DataFrame, xCol: String, yCol: String,
      path: String, partitions: Int = 4,
      blockBytes: Int = 16 * 1024): Unit =
    withZ(df, xCol, yCol)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes.toString)
      .option("parquet.page.size", (blockBytes / 2).toString)
      .parquet(path)

  /** The linear (arrival-order) counter-layout for the same frame:
    * range-clustered and sorted by `orderCol` alone — what a log
    * written as it arrives looks like.
    */
  def linearWrite(df: DataFrame, orderCol: String, path: String,
      partitions: Int = 4, blockBytes: Int = 16 * 1024): Unit =
    df.repartitionByRange(partitions, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes.toString)
      .option("parquet.page.size", (blockBytes / 2).toString)
      .parquet(path)
}
