package graft

import graft.functions.Tokenize

class TokenizeSpec extends SparkTestBase {

  // deterministic hand-rolled property sampling (no scalacheck bridge
  // in the dependency set)
  private val propCharset: IndexedSeq[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
      "!@#$,.-;:_ '\"()?&*+=/\\ \u00e9\u4e2d").toIndexedSeq
  private def samples(n: Int): Seq[String] = {
    val rng = new scala.util.Random(42)
    (1 to n).map { _ =>
      val len = rng.nextInt(40)
      (1 to len).map(_ => propCharset(rng.nextInt(propCharset.size))).mkString
    }
  }

  // Hand-computed goldens from the reference's own worked example
  // (FIXTURES.md §1.1; reference handlers.py:128-154).
  val goldens: Seq[(String, String)] = Seq(
    "James Cameron" -> "james cameron",
    "Gore Verbinski" -> "gore verbinski",
    "Avatar" -> "avatar",
    "Pirates of the Caribbean: At World's End" -> "pirates caribbean world''s end",
    // translate chars -> space, runs collapse
    "a!@#$,.-;:_b" -> "b", // 'a' is a stopword at string start
    "x!@#$,.-;:_y" -> "x y",
    // non-ASCII dropped without inserting space
    "Sam Raimi" -> "samraimi",
    "café latte" -> "caf latte",
    // stopword edges: start / end / middle / sequential artifacts
    "the matrix" -> "matrix",
    "matrix the" -> "matrix",
    "lord of the rings" -> "lord rings",
    "The Lord Of The Rings" -> "lord rings",
    // sequential single-pass: "x a a y" leaves one 'a'
    "x a a y" -> "x a y",
    // possessive quirk
    "World s End" -> "world''s end",
    "Customer#000000003" -> "customer 000000003",
    "1-URGENT" -> "1 urgent",
    "4-NOT SPECIFIED" -> "4 specified",
    "" -> "",
    "   " -> "",
    "the" -> "the" // single token: no space-delimited pattern matches
  )

  test("cleanRef matches hand-computed goldens") {
    for ((in, want) <- goldens)
      assert(Tokenize.cleanRef(in) == want, s"input <$in>")
  }

  test("cleanRef equals the literal Python port (translate step redundant)") {
    for (s <- samples(3000))
      assert(Tokenize.cleanRef(s) == Tokenize.cleanLiteralPort(s), s"input <$s>")
    for ((in, _) <- goldens)
      assert(Tokenize.cleanRef(in) == Tokenize.cleanLiteralPort(in))
  }

  test("clean output shape: charset [a-z0-9' ], trimmed, single spaces") {
    for (s <- samples(3000)) {
      val out = Tokenize.cleanRef(s)
      assert(out.forall(ch => ch.isLetterOrDigit && ch < 128 || ch == ' ' || ch == '\''),
        s"charset violation in <$out> from <$s>")
      assert(out == out.trim, s"not trimmed <$out>")
      assert(!out.contains("  "), s"double space <$out>")
    }
  }

  test("cleanFast equals cleanRef on goldens and random samples") {
    for ((in, want) <- goldens)
      assert(Tokenize.cleanFast(in) == want, s"input <$in>")
    for (s <- samples(5000))
      assert(Tokenize.cleanFast(s) == Tokenize.cleanRef(s), s"input <$s>")
    assert(Tokenize.cleanFast(null) == null)
  }

  test("StaticInvoke clean equals the built-in expression chain") {
    import spark.implicits._
    val edge = goldens.map(_._1) ++ samples(500)
    val all = edge.toDF("s")
    val got = all
      .select($"s", Tokenize.clean($"s").as("a"), Tokenize.cleanChain($"s").as("b"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"input <${r.getString(0)}>")
    }
  }

  test("Spark Column clean equals cleanRef on goldens and corpus sample") {
    import spark.implicits._
    val edge = goldens.map(_._1) ++ Seq(
      "s s s", "a a a b", "the the x", "of of of", "x of of y",
      "A!B@C#D$E", "  ", "d d", "ve ve", "v v v",
      "it was a dark night", "they will v ve d", "end with of",
      "of start", " padded  ", "tabs\tand\nnewlines")
    val corpus = spark.read.parquet(s"$sf0001/part.parquet")
      .select($"p_name".as("s")).as[String].collect().toSeq ++
      spark.read.parquet(s"$sf0001/documents.parquet")
        .select($"text".as("s")).as[String].collect().toSeq
    val all = (edge ++ corpus).toDF("s")
    val got = all.select($"s", Tokenize.clean($"s").as("c")).collect()
    got.foreach { r =>
      val in = r.getString(0)
      assert(r.getString(1) == Tokenize.cleanRef(in), s"input <$in>")
    }
  }

  test("null propagates to null") {
    import spark.implicits._
    val r = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(Tokenize.clean($"s")).collect()
    assert(r(0).isNullAt(0) && r(1).getString(0) == "x")
  }
}
