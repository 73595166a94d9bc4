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
}
