package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Column-API wiring for the BPE runtime segmentation static call
  * ([[SegmentFns.segment]]) — the [[Tokenize.clean]] `StaticInvoke`
  * pattern: one codegen'd static call per row regardless of how many
  * trained merges the shipped constant carries, instead of one
  * Catalyst node per merge.
  */
object GraftFns {
  /** `segment(word, packedMerges)` as a codegen'd column: returns the
    * space-joined symbol sequence of `word` under the packed merge
    * list (`"a b,aa b,..."`, rank order).
    */
  def segmentInvoke(word: Column, packedMerges: String): Column =
    GraftInternal.column(
      StaticInvoke(
        SegmentFns.getClass,
        StringType,
        "segment",
        Seq(GraftInternal.expression(word),
          GraftInternal.expression(lit(packedMerges))),
        inputTypes = Seq(StringType, StringType),
        propagateNull = true,
        returnNullable = true))
}

/** The static segmentation kernel. Merge parsing is memoized per
  * packed string (one entry per trained tokenizer per executor); the
  * per-row work is the same literal left-to-right replace sequence
  * the trainer applies per round (`java.lang.String.replace` has
  * exactly the SQL `replace` all-occurrences semantics), so a word
  * segments identically here, in the chain expression, and in the
  * trainer's own words frame — pinned by `BpeSpec`.
  */
object SegmentFns {
  /** Last-used PER-THREAD memo, not an unbounded map: packed merge
    * lists are MB-scale at production merge counts and keyed by their
    * full content, so a ConcurrentHashMap would retain every
    * tokenizer generation a long-lived session ever trains (round-8
    * ADVICE) — and even LOOKING UP such a key costs O(len) per row
    * (hash or content compare of megabytes). The memo keys on the
    * constant's REFERENCE: codegen ships the packed literal as ONE
    * `UTF8String` object per deserialized task, so within a task the
    * hot path is a pointer compare and the O(len) `toString` + parse
    * runs once. The slot must be thread-local, NOT shared: each
    * concurrent task holds its OWN deserialized copy of the literal,
    * so a single shared slot would miss on nearly every row whenever
    * the stage runs >1 task in parallel — alternating tasks evict
    * each other and the MB-scale parse degrades to per-row work
    * (round-9 review). Task threads are pooled, so residency is
    * bounded by pool size × one tokenizer; nothing accumulates.
    */
  private val cached =
    new ThreadLocal[(UTF8String, Array[Array[String]])]

  /** CONTRACT: `packedMerges` is meant to be a PLAN LITERAL (the
    * [[GraftFns.segmentInvoke]] wiring only builds it that way) — the
    * reference hit is what makes the hot path O(1). A caller passing
    * a per-row merge column still computes correctly but falls to the
    * secondary guard below: a length + content compare per row
    * (O(len) memcmp, round-10 ADVICE) instead of a silent full
    * re-PARSE per row (O(len) plus per-merge allocation) when the row
    * value happens to repeat — and a genuinely varying column pays
    * the parse, which is the semantics it asked for.
    */
  private def parse(packed: UTF8String): Array[Array[String]] = {
    val c = cached.get()
    if (c != null && ((c._1 eq packed) ||
        (c._1.numBytes == packed.numBytes && c._1.equals(packed)))) c._2
    else {
      val p = packed.toString
      val parsed =
        if (p.isEmpty) Array.empty[Array[String]]
        else p.split(',').map(_.split(' '))
      cached.set((packed, parsed))
      parsed
    }
  }

  def segment(word: UTF8String, packedMerges: UTF8String): UTF8String = {
    if (word == null || packedMerges == null) return null
    val w = word.toString
    if (w.isEmpty) return UTF8String.fromString("")
    val sb = new java.lang.StringBuilder(w.length * 3)
    var i = 0
    while (i < w.length) { sb.append('|').append(w.charAt(i)).append('|'); i += 1 }
    var framed = sb.toString
    val ms = parse(packedMerges)
    var k = 0
    while (k < ms.length) {
      val a = ms(k)(0); val b = ms(k)(1)
      framed = framed.replace("|" + a + "||" + b + "|", "|" + a + b + "|")
      k += 1
    }
    UTF8String.fromString(
      framed.substring(1, framed.length - 1).split("\\|\\|").mkString(" "))
  }
}
