package graft

import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** URL canonicalization rung: each planted noise axis must collapse
  * onto one canonical key (the crawl-frontier identity), and content
  * the canonicalization must NOT touch must survive (path case,
  * non-tracking parameters). The registered queries hash against the
  * DuckDB twin; this spec pins the per-axis behavior on literal URLs
  * where a corpus-level hash could not say WHICH rule broke.
  */
class UrlDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(url: String): String =
    Dedup.urlNormalizedOf(Seq((1L, url)).toDF("doc_id", "url"))
      .head().getString(2)

  test("each noise axis collapses; meaningful structure survives") {
    val canonical = "news.example.com/articles/7?id=7"
    // scheme case + scheme itself
    assert(norm("https://news.example.com/articles/7?id=7") === canonical)
    assert(norm("HTTP://news.example.com/articles/7?id=7") === canonical)
    // www + default ports
    assert(norm("https://WWW.News.Example.com:443/articles/7?id=7") === canonical)
    assert(norm("http://news.example.com:80/articles/7?id=7") === canonical)
    // trailing + duplicate slashes
    assert(norm("https://news.example.com//articles//7/?id=7") === canonical)
    // fragment
    assert(norm("https://news.example.com/articles/7?id=7#section2") === canonical)
    // tracking params drop, order sorts, real params survive
    assert(norm("https://news.example.com/articles/7?utm_source=feed&id=7") === canonical)
    assert(norm("https://news.example.com/articles/7?id=7&utm_campaign=x&fbclid=abc") === canonical)
    assert(norm("https://news.example.com/articles/7?b=2&a=1")
      === "news.example.com/articles/7?a=1&b=2")
    // path stays case-sensitive; an all-tracking query drops entirely
    assert(norm("https://news.example.com/Articles/7?id=7")
      === "news.example.com/Articles/7?id=7")
    assert(norm("https://news.example.com/articles/7?utm_source=feed")
      === "news.example.com/articles/7")
    // scheme-less and protocol-relative forms carry the same identity
    // (the canonicalizer's own output is scheme-less — round-12
    // ADVICE: these normalized to '' and MERGED)
    assert(norm("news.example.com/articles/7?id=7") === canonical)
    assert(norm("//news.example.com/articles/7?id=7") === canonical)
    assert(norm("WWW.News.Example.com:443/articles/7?id=7") === canonical)
    // a scheme-less host keeps its non-default port as identity
    assert(norm("localhost:8080/x") === "localhost:8080/x")
  }

  test("URLs with no extractable host are dropped, never merged") {
    import org.apache.spark.sql.functions.lit
    val malformed = Seq((1L, "/path/only"), (2L, "?id=7"), (3L, "https://"),
      (4L, "www.:443/x"), (5L, "#frag"), (6L, ""))
      .toDF("doc_id", "url")
    assert(Dedup.urlNormalizedOf(malformed).count() === 0L)
    // mixed with a valid row, only the valid identity survives —
    // the malformed rows form NO shared '' group.
    val mixed = malformed.union(Seq((7L, "https://a.example.com/x")).toDF("doc_id", "url"))
    val out = Dedup.urlNormalizedOf(mixed).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(7L))
    assert(out.head.getString(2) === "a.example.com/x")
    assert(Dedup.urlNormalizedOf(mixed.withColumn("url", lit(null: String))).count() === 0L)
  }

  test("canonicalization is idempotent over randomized crawl-noise URLs") {
    // a canonicalizer that moves an already-canonical URL re-splits
    // identities on every re-crawl cycle; idempotence is the
    // frontier's convergence guarantee. Property: re-normalizing the
    // canonical form AS EMITTED (scheme-less — no re-prefixing; the
    // round-12 ADVICE hole was exactly that the function was not a
    // fixed point over its own output) — over a generator that
    // composes every noise axis randomly.
    val rnd = new scala.util.Random(42)
    val urls = (1 to 200).map { _ =>
      val scheme = Seq("https://", "HTTP://", "hTTps://")(rnd.nextInt(3))
      val www = if (rnd.nextBoolean()) "WWW." else ""
      val host = Seq("News.Example.com", "blog.site.ORG", "a-b.example.net")(rnd.nextInt(3))
      val port = Seq("", ":443", ":80")(rnd.nextInt(3))
      val path = (1 to rnd.nextInt(4)).map(_ =>
        Seq("Articles", "x", "7", "p-q")(rnd.nextInt(4))).mkString("/", "/", "") +
        Seq("", "/", "//")(rnd.nextInt(3))
      val params = (0 until rnd.nextInt(4)).map(_ =>
        Seq("id=7", "a=1", "utm_source=f", "fbclid=z", "ref=r", "b=2")(rnd.nextInt(6)))
      val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
      val frag = Seq("", "#top", "#s2")(rnd.nextInt(3))
      scheme + www + host + port + path + q + frag
    }
    val once = Dedup.urlNormalizedOf(
        urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "url"))
      .select("doc_id", "url_norm").collect().map(r => (r.getLong(0), r.getString(1)))
    val twice = Dedup.urlNormalizedOf(
        once.map { case (i, n) => (i, n) }.toSeq.toDF("doc_id", "url"))
      .select("doc_id", "url_norm").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(twice.sorted.toSeq === once.sorted.toSeq)
  }

  test("the registered dedup collapses exactly the planted variants") {
    val groups = SparkEntry.queries("dedup_url_normalized")(spark, sf0001)
    // every group's raw-form count never exceeds its copies, and the
    // plant guarantees multi-spelling groups exist.
    val rows = groups.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) <= r.getLong(2)))
    assert(rows.exists(_.getLong(3) > 1L), "no multi-spelling group collapsed")
    // identity is (source, doc_id % 50): the keeper plus copies
    // reconstruct the corpus rows with a non-null source.
    val totalDocs = rows.map(_.getLong(2)).sum
    val expected = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("source").isNotNull).count()
    assert(totalDocs === expected)
    // null-source docs are absent from the mapping (contract).
    val mapped = SparkEntry.queries("dedup_url_normalize")(spark, sf0001)
    assert(mapped.where(col("url").isNull).count() === 0L)
  }

  test("the domain report accounts every url-bearing doc exactly once") {
    val rep = SparkEntry.queries("url_domain_report")(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(col("source").isNotNull).count()
    assert(rep.map(_.getLong(1)).sum === docs)
    // planted identity guarantees a real dedup rate somewhere, and
    // rates stay in [0, 10000].
    assert(rep.exists(_.getLong(3) > 0L))
    assert(rep.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 10000 &&
      r.getLong(4) >= 0 && r.getLong(4) <= 10000))
  }
}
