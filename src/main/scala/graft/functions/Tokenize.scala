package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Cell-value cleaning / tokenization (the engine's only scalar text
  * function on the search path).
  *
  * Re-implements, bit-for-bit, the reference's
  * `clean_argument_for_query` (reference `handlers.py:128-154`):
  *
  *   1. lowercase
  *   2. translate `!@#$,.-;:_` -> space        (handlers.py:136-137)
  *   3. drop non-ASCII codepoints, then replace every `[\W_]+` run
  *      with a single space                     (handlers.py:142)
  *   4. collapse spaces, strip                  (handlers.py:143)
  *   5. `" s "` -> `"''s "` possessive quirk    (handlers.py:146)
  *   6. for each of 32 stopwords IN ORDER: replace all `" w "` with
  *      `" "`, strip one leading `"w "`, strip one trailing `" w"`
  *      (handlers.py:148-153)
  *
  * Step 2 is provably redundant: every char in the translate list is
  * ASCII and matched by `[\W_]` in step 3, and its output (space) is
  * also matched, so adjacent runs merge identically. We therefore skip
  * it in all three implementations below (a property test asserts the
  * equivalence against a literal port that keeps the translate step).
  *
  * Three synchronized implementations:
  *  - [[clean]]    — pure Spark Column expression chain (codegen'd, no UDF)
  *  - [[cleanSql]] — the same chain rendered as DuckDB SQL (for the oracle)
  *  - [[cleanRef]] — plain Scala (unit-test reference, mirrors Python)
  *
  * All three use left-to-right non-overlapping replacement, which is
  * the shared semantics of Python `str.replace`, Java `replaceAll`,
  * and RE2 global replace.
  */
object Tokenize {

  /** Stopword list in reference order (`handlers.py:138-140`). Order
    * matters: replacement is sequential, one pass per word.
    */
  val Stopwords: Seq[String] = Seq(
    "a", "the", "of", "on", "in", "an", "and", "is", "at", "are", "as",
    "be", "but", "by", "for", "it", "no", "not", "or", "such", "that",
    "their", "there", "these", "to", "was", "with", "they", "will",
    "v", "ve", "d")

  /** Spark-native cleaning: ONE codegen'd static call per row (see
    * [[cleanFast]]) instead of the ~96-deep `regexp_replace` chain of
    * [[cleanChain]]. The deep chain blew past the codegen method-size
    * limit and re-ran ~96 sequential regex scans per cell — measured as
    * the dominant cost of the sf0.1 index build. `StaticInvoke` stays
    * inside whole-stage codegen (direct static call, no UDF
    * serialization) and null-propagates via `propagateNull`.
    */
  def clean(c: Column): Column = GraftInternal.column(
    StaticInvoke(
      CleanFns.getClass,
      StringType,
      "clean",
      Seq(GraftInternal.expression(c)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = true))

  /** Unicode NFC normalization as a codegen'd column ([[NfcFns]]). */
  def nfc(c: Column): Column = GraftInternal.column(
    StaticInvoke(
      NfcFns.getClass,
      StringType,
      "nfc",
      Seq(GraftInternal.expression(c)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = true))

  /** TOTALITY CONVENTION (adopted round 11, after a reproduced sf0.1
    * crash in the winnow queries): **every higher-order array
    * expression that feeds a generator (`explode`/`posexplode`) must
    * be TOTAL — evaluable without error on ANY input row, including
    * rows an upstream `.where` guard would drop.** The guard is NOT
    * protection: Catalyst's `InferFiltersFromGenerate` infers
    * `size(e) > 0 AND isnotnull(e)` from `explode(e)` and pushes the
    * ENTIRE inlined expression through the projections into the
    * Filter that holds the guard, where whole-stage-codegen
    * subexpression elimination evaluates it EAGERLY before the guard
    * conjunct can short-circuit. The two partial-function footguns
    * under ANSI mode:
    *
    *   1. `sequence(1, size(t) - m)` with `size(t) <= m` flips
    *      DESCENDING (`sequence(1, 0)` = `[1, 0]`) — window starts of
    *      0 and below, never an empty array;
    *   2. `element_at(arr, i)` throws on `i = 0` or `i > size(arr)`
    *      (and on a missing map key).
    *
    * So: build sliding windows with [[windowedSql]] / [[gramsSql]]
    * (CASE-guarded — short inputs yield `array()`, which the
    * generator then correctly emits nothing for), and use
    * `try_element_at` for in-branch indexing. Raw `element_at` /
    * `sequence` remain legal ONLY where bounds hold by construction
    * on every row (constant bounds, fixed-layout arrays) — each such
    * site is pinned by `ConventionSpec`'s per-file allowlist.
    */

  /** Total sliding-window transform: apply `lambda` at each 1-based
    * window start `i = 1 .. size(arr) - width + 1`; inputs shorter
    * than `width` yield `array()` instead of a descending-sequence
    * crash. `lambda` must itself be total for `i` in that range
    * (prefer `try_element_at`).
    */
  def windowedSql(arr: String, width: Int, lambda: String): String =
    s"CASE WHEN size($arr) >= $width THEN " +
      s"transform(sequence(1, size($arr) - ${width - 1}), $lambda) " +
      s"ELSE array() END"

  /** Total word n-grams over a token-array column: space-joined runs
    * of `n` adjacent elements, `array()` when fewer than `n` tokens.
    */
  def gramsSql(arr: String, n: Int): String = {
    val parts = (0 until n).map(j => s"try_element_at($arr, i + $j)").mkString(", ")
    windowedSql(arr, n, s"i -> concat_ws(' ', $parts)")
  }

  /** The original pure-built-in expression chain (kept as a spec
    * cross-check for the property tests; not on the hot path).
    */
  def cleanChain(c: Column): Column = {
    var x = lower(c)
    // Python: .encode('ascii','ignore') — drop non-ASCII codepoints.
    x = regexp_replace(x, "[^\\x00-\\x7F]", "")
    // Python: re.sub('[\W_]+',' ') on ASCII, post-lower => [^a-z0-9]+.
    x = regexp_replace(x, "[^a-z0-9]+", " ")
    x = trim(x)
    x = regexp_replace(x, " s ", "''s ")
    for (w <- Stopwords) {
      x = regexp_replace(x, s" $w ", " ")
      x = regexp_replace(x, s"^$w ", "")
      x = regexp_replace(x, s" $w$$", "")
    }
    x
  }

  // ---- optimized single-pass implementation (exact cleanRef semantics) ----

  private val StopMid: Array[String] = Stopwords.map(w => s" $w ").toArray
  private val StopPre: Array[String] = Stopwords.map(w => s"$w ").toArray
  private val StopSuf: Array[String] = Stopwords.map(w => s" $w").toArray

  /** Left-to-right non-overlapping literal replace (the shared
    * semantics of Python `str.replace` / Java `String.replace`);
    * returns the same instance when there is no occurrence.
    */
  private def replaceLit(s: String, target: String, repl: String): String = {
    var idx = s.indexOf(target)
    if (idx < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (idx >= 0) {
      sb.append(s, last, idx).append(repl)
      last = idx + target.length
      idx = s.indexOf(target, last)
    }
    sb.append(s, last, s.length).toString
  }

  /** Optimized equivalent of [[cleanRef]]: steps 1-4 (lowercase, drop
    * non-ASCII, collapse non-alnum runs to single spaces, trim) fuse
    * into one character pass; the possessive quirk and the 32-stopword
    * sequential replacement use literal `indexOf` scans instead of
    * regex. A property test asserts `cleanFast == cleanRef` on
    * arbitrary input.
    */
  def cleanFast(s: String): String = {
    if (s == null) return null
    // Non-ASCII chars may lowercase into ASCII (e.g. U+212A Kelvin ->
    // 'k'), so full-string lowering must precede the ASCII filter; the
    // all-ASCII fast path lowers per-char inside the fused loop.
    var hasNonAscii = false
    var i = 0
    while (i < s.length && !hasNonAscii) {
      if (s.charAt(i) >= 128) hasNonAscii = true
      i += 1
    }
    val src = if (hasNonAscii) s.toLowerCase else s
    val n = src.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    i = 0
    while (i < n) {
      var c = src.charAt(i)
      if (c < 128) {
        if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          if (pendingSpace && sb.length > 0) sb.append(' ')
          pendingSpace = false
          sb.append(c)
        } else pendingSpace = true
      }
      i += 1
    }
    var x = sb.toString
    x = replaceLit(x, " s ", "''s ")
    var j = 0
    while (j < StopMid.length) {
      x = replaceLit(x, StopMid(j), " ")
      if (x.startsWith(StopPre(j))) x = x.substring(StopPre(j).length)
      if (x.endsWith(StopSuf(j))) x = x.substring(0, x.length - StopSuf(j).length)
      j += 1
    }
    x
  }

  /** The same chain as DuckDB SQL over `expr` (a SQL expression
    * string). Used to build `SparkEntry.oracleSql`. DuckDB's
    * regexp_replace needs the 'g' option for replace-all; the
    * anchored prefix/suffix strips replace at most once by
    * construction.
    */
  /** Spark-SQL dialect of [[cleanSql]]: identical regexp chain, but
    * Spark's `regexp_replace` replaces every match by default (its
    * 4th argument is a position, not DuckDB's `'g'` flag). Used by
    * the engine's `spark.sql` surface ([[graft.operators.SqlSearch]]);
    * parity with [[clean]] is spec-pinned.
    */
  def cleanSqlSpark(expr: String): String = {
    var x = s"lower($expr)"
    // Spark SQL string literals process backslash escapes (unlike
    // DuckDB's), so the regex needs a doubled backslash IN THE SQL
    // TEXT to deliver \x00 to the regex engine.
    x = s"regexp_replace($x, '[^\\\\x00-\\\\x7F]', '')"
    x = s"regexp_replace($x, '[^a-z0-9]+', ' ')"
    x = s"trim($x)"
    x = s"regexp_replace($x, ' s ', '''''s ')"
    for (w <- Stopwords) {
      x = s"regexp_replace($x, ' $w ', ' ')"
      x = s"regexp_replace($x, '^$w ', '')"
      x = s"regexp_replace($x, ' $w$$', '')"
    }
    x
  }

  def cleanSql(expr: String): String = {
    var x = s"lower($expr)"
    x = s"regexp_replace($x, '[^\\x00-\\x7F]', '', 'g')"
    x = s"regexp_replace($x, '[^a-z0-9]+', ' ', 'g')"
    x = s"trim($x)"
    // replacement literal is `''s ` — each quote doubled for SQL.
    x = s"regexp_replace($x, ' s ', '''''s ', 'g')"
    for (w <- Stopwords) {
      x = s"regexp_replace($x, ' $w ', ' ', 'g')"
      x = s"regexp_replace($x, '^$w ', '')"
      x = s"regexp_replace($x, ' $w$$', '')"
    }
    x
  }

  /** Plain-Scala reference implementation (test oracle only; the
    * engine never calls this per-row).
    */
  def cleanRef(s: String): String = {
    if (s == null) return null
    var x = s.toLowerCase
    x = x.filter(_ < 128)
    x = x.replaceAll("[^a-z0-9]+", " ")
    x = x.trim
    x = x.replace(" s ", "''s ")
    for (w <- Stopwords) {
      x = x.replace(s" $w ", " ")
      if (x.startsWith(s"$w ")) x = x.substring(w.length + 1)
      if (x.endsWith(s" $w")) x = x.substring(0, x.length - w.length - 1)
    }
    x
  }

  /** Literal port of `handlers.py:128-154` INCLUDING the redundant
    * translate step — used only by the property test proving
    * [[cleanRef]] ≡ the full pipeline.
    */
  def cleanLiteralPort(s: String): String = {
    if (s == null) return null
    var x = s.toLowerCase
    x = x.map(ch => if ("!@#$,.-;:_".contains(ch)) ' ' else ch)
    x = x.filter(_ < 128)
    x = x.replaceAll("[\\W_]+", " ").toLowerCase
    x = x.replaceAll(" +", " ").trim
    x = x.replace(" s ", "''s ")
    for (w <- Stopwords) {
      x = x.replace(s" $w ", " ")
      if (x.startsWith(s"$w ")) x = x.substring(w.length + 1)
      if (x.endsWith(s" $w")) x = x.substring(0, x.length - w.length - 1)
    }
    x
  }
}

/** Static entry point for the codegen'd cleaning expression
  * ([[Tokenize.clean]]'s `StaticInvoke` target). Scala object =>
  * static forwarder `graft.functions.CleanFns.clean` in bytecode,
  * which generated code calls directly.
  */
object CleanFns {
  def clean(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(Tokenize.cleanFast(s.toString))
}

/** Static entry point for the codegen'd Unicode-NFC normalization
  * ([[graft.operators.TextAnalysis.nfcNormalize]]'s `StaticInvoke`
  * target). UAX#15 canonical composition via the JDK's
  * `java.text.Normalizer` — the pre-hash/pre-dedup rung a real crawl
  * needs (the byte-identical dedup of `é` vs `e`+U+0301 depends on
  * normalizing FIRST; so does any content fingerprint). The DuckDB
  * oracle runs `nfc_normalize` (utf8proc) — hash equality through
  * the gate pins the two engines to one UAX#15 NFC on the planted
  * decomposed fixtures. Row-local, codegen'd, no UDF.
  */
object NfcFns {
  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
}
