package graft.sinks

import org.apache.spark.sql.DataFrame

/** S10: console sink. The reference prints its ranked result table
  * to stdout (`Par_Search.py:121-122`); this is the engine-side
  * equivalent — a deterministic fixed-width rendering of the first
  * `n` rows, returned as a string so callers own the output stream
  * and specs can assert on it.
  *
  * The `limit(n).collect()` is bounded by `n` BY DESIGN: a console
  * sink is a driver-side terminal operation on an already-ranked,
  * already-limited result — never part of a distributed plan.
  */
object ConsoleSink {

  def render(df: DataFrame, n: Int = 20): String = {
    val cols = df.columns.toSeq
    val rows = df.limit(n).collect()
      .map(r => cols.indices.map(i => String.valueOf(r.get(i))))
    val widths = cols.indices.map(i =>
      (cols(i).length +: rows.map(_(i).length)).max)
    def line(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(sep, line(cols), sep) ++ rows.map(line) :+ sep).mkString("\n")
  }

  def show(df: DataFrame, n: Int = 20): Unit =
    // scalastyle:off println
    println(render(df, n))
    // scalastyle:on println

  /** Seq-parity line format: the reference's sequential engine prints
    * each ranked table as `<table, score, column scores{col: n, ...}>`
    * (`Object.py:100-104` — a `Counter` repr with the class name
    * swapped out; columns in count-desc order, column-asc tie-break
    * here for determinism). Input is a per-table top-column frame
    * `(table_id, column_id, join_score)` (normally the A3 top-2 from
    * [[graft.operators.JoinSearch.searchTablesSeqParity]]'s ladder);
    * ranking + the top-`n` bound happen relationally, so the collect
    * stays bounded at <= 2n rows by design, like [[render]].
    */
  def renderSeqMatches(topCols: DataFrame, n: Int = 30): String = {
    import org.apache.spark.sql.functions._
    val scored = topCols.groupBy("table_id")
      .agg(sum("join_score").cast("long").as("score"))
      .orderBy(col("score").desc, col("table_id").asc)
      .limit(n)
    val rows = topCols.join(broadcast(scored), Seq("table_id"))
      .orderBy(col("score").desc, col("table_id").asc,
        col("join_score").desc, col("column_id").asc)
      .select("table_id", "score", "column_id", "join_score")
      .collect()
    val byTable = scala.collection.mutable.LinkedHashMap
      .empty[(Long, Long), Vector[(Long, Long)]]
    rows.foreach { r =>
      val k = (r.getAs[Any]("table_id").toString.toLong,
        r.getAs[Long]("score"))
      byTable(k) = byTable.getOrElse(k, Vector.empty) :+
        ((r.getAs[Any]("column_id").toString.toLong,
          r.getAs[Long]("join_score")))
    }
    byTable.map { case ((tid, score), cols) =>
      val cs = cols.map { case (c, s) => s"$c: $s" }.mkString(", ")
      s"<$tid, $score, column scores{$cs}>"
    }.mkString("\n")
  }
}
