package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
  *   6. for each of 31 stopwords IN ORDER: replace all `" w "` with
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

  /** Spark-native cleaning: a chain of built-in string expressions.
    * Stays inside whole-stage codegen; null propagates to null.
    */
  def clean(c: Column): Column = {
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

  /** The same chain as DuckDB SQL over `expr` (a SQL expression
    * string). Used to build `SparkEntry.oracleSql`. DuckDB's
    * regexp_replace needs the 'g' option for replace-all; the
    * anchored prefix/suffix strips replace at most once by
    * construction.
    */
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
