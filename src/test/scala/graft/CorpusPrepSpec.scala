package graft

import org.apache.spark.sql.functions.{col, from_json}

import graft.operators.CorpusPrep

/** The two-pass distributed running sum behind shard packing must
  * equal the sequential prefix sum exactly — checked against a
  * driver-computed expectation on randomized doc sizes, including
  * doc_id gaps (sparse buckets) and empty leading buckets.
  */
class CorpusPrepSpec extends SparkTestBase {
  import spark.implicits._

  test("shard packing equals the sequential prefix sum on random sparse ids") {
    val rng = new scala.util.Random(7)
    // sparse, gappy ids: some buckets empty, some dense
    val rows = (0 until 400)
      .map(i => (i * rng.nextInt(3).toLong + i, rng.nextInt(200) + 1L))
      .distinctBy(_._1).sortBy(_._1)
    val budget = 1000L
    var before = 0L
    val expected = rows.map { case (id, n) =>
      val shard = before / budget; before += n; (id, n, shard)
    }
    val got = CorpusPrep.shardPackingOf(
        rows.toDF("doc_id", "n_tokens"), budget, bucketSize = 50L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // shards fill to the budget: every shard boundary is crossed by
    // exactly the doc that straddles it (greedy rule)
    assert(got.map(_._3).distinct.sorted == got.map(_._3).distinct)
  }

  test("near-dup clusters never straddle the train/eval boundary") {
    import org.apache.spark.sql.functions._
    val dirP = java.nio.file.Files.createTempDirectory("graft-leakfree")
    java.nio.file.Files.list(java.nio.file.Paths.get(sf0001)).forEach { p =>
      java.nio.file.Files.copy(p, dirP.resolve(p.getFileName.toString),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val dir = dirP.toString
    // plant exact clones of doc 3 at ids the per-identity split
    // SCATTERS (md5 buckets: 3 → train, 9000001 → val) — the
    // leakage case: a 100%-identical "eval" document.
    val src = s"$dir/documents.parquet"
    val base = spark.read.parquet(src)
    val grown = Seq(9000001L, 9000002L)
      .map(id => base.where(col("doc_id") === 3L)
        .withColumn("doc_id", lit(id)))
      .foldLeft(base)(_ unionByName _).localCheckpoint(true)
    grown.write.mode("overwrite").parquet(src)
    val perDoc = CorpusPrep.splitLeakfreePerDoc(spark, dir)
    // split is a function of the cluster key — no key can straddle.
    assert(perDoc.groupBy("skey")
      .agg(countDistinct("split").as("ns"))
      .where(col("ns") > 1).count() === 0L)
    // the planted cluster takes its keeper's split for EVERY member:
    // had clustering missed a clone (or the key coalescing broken),
    // 9000001 would key on itself and land in val — two splits.
    val got = perDoc.where(col("doc_id").isin(3L, 9000001L, 9000002L))
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(got === Seq("train"), s"planted cluster splits: $got")
    // the registered rollup is exactly the per-doc rollup.
    val roll = CorpusPrep.splitLeakfree(spark, dir)
      .collect().map(_.toString).toSeq
    val expect = perDoc.groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy("split", "lang").collect().map(_.toString).toSeq
    assert(roll === expect && roll.nonEmpty)
  }

  test("token-counter seam: a non-default counter re-prices the same packing") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "alpha beta"),            // ws: 2 tokens, subword: ceil(5/4)+ceil(4/4)=3
      (2L, "internationalization"),  // ws: 1,        subword: ceil(20/4)=5
      (3L, "a  b\tc"))               // ws: 3,        subword: 1+1+1=3
      .toDF("doc_id", "text")
    val ws = CorpusPrep.WhitespaceCounter.count(col("text")).as("n")
    val sub = CorpusPrep.SubwordCounter.count(col("text")).as("n")
    assert(docs.select(col("doc_id"), ws).as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (2L, 1L), (3L, 3L)))
    assert(docs.select(col("doc_id"), sub).as[(Long, Long)].collect().toSet ==
      Set((1L, 3L), (2L, 5L), (3L, 3L)))
    // same packing algorithm, different budget consumption: with
    // budget 5, subword pricing pushes doc 3 into shard 1 while
    // whitespace pricing keeps all three in shard 0.
    def shards(counter: CorpusPrep.TokenCounter): Seq[(Long, Long)] =
      CorpusPrep.shardPackingOf(
          docs.select(col("doc_id"), counter.count(col("text")).as("n_tokens")),
          budget = 5L, bucketSize = 2L)
        .select(col("doc_id"), col("shard_id"))
        .as[(Long, Long)].collect().toSeq
    assert(shards(CorpusPrep.WhitespaceCounter) == Seq((1L, 0L), (2L, 0L), (3L, 0L)))
    assert(shards(CorpusPrep.SubwordCounter) == Seq((1L, 0L), (2L, 0L), (3L, 1L)))
  }

  test("decontamination: exact 5-gram overlap on a hand-built eval set") {
    val evalDocs = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "one two three four five six"),   // verbatim eval copy: 2/2 grams hit
      (11L, "zero one two three four five"),  // shares 1 of its 2 grams
      (12L, "aa bb cc dd ee ff gg"),          // disjoint vocabulary: 0 hits
      (13L, "short text only"))               // < 5 tokens: no grams, no row
      .toDF("doc_id", "text")
    val got = CorpusPrep.decontaminateAgainst(train, evalDocs, n = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (10L, 2L, 2L, 10000L, 1L),
      (11L, 2L, 1L, 5000L, 1L),
      (12L, 3L, 0L, 0L, 0L)))
  }

  test("manifest checksum is order-independent but pairing-sensitive") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "alpha", "en", "src0", 5L),
      (2L, "beta", "en", "src0", 4L),
      (3L, "gamma", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def sums(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Long, Long, Long)] =
      CorpusPrep.manifestOf(df)
        .as[(String, String, Long, Long, Long)].collect().toSeq
    val base = sums(docs)
    // row order cannot matter: the checksum is a sum, not a fold.
    assert(sums(docs.orderBy(col("doc_id").desc)) == base)
    // swapping which text belongs to which doc_id MUST change it,
    // even though the text multiset (and so per-text hashes) did not.
    val swapped = Seq(
      (1L, "beta", "en", "src0", 5L),
      (2L, "alpha", "en", "src0", 4L),
      (3L, "gamma", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(sums(swapped).map(_._5) != base.map(_._5))
    // counts and char sums are pairing-blind, as documented.
    assert(sums(swapped).map(t => (t._1, t._2, t._3, t._4)) ==
      base.map(t => (t._1, t._2, t._3, t._4)))
  }

  test("source cap equals the window formulation on a skewed, tie-heavy corpus") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(11)
    // one hot source (the case the cap exists for), several small
    // ones, and deliberate n_chars ties to exercise the doc_id
    // tie-break; sizes drawn from a narrow range so ties are common.
    val rows = (0 until 500).map { i =>
      val src = if (i < 400) "hot" else s"cold${i % 7}"
      (src, i.toLong, (rng.nextInt(20) + 1).toLong)
    }
    val df = rows.toDF("source", "doc_id", "n_chars")
    val n = 5
    val got = CorpusPrep.sourceCapOf(df, n)
      .as[(String, Long, Long, Long)].collect().toSeq
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val expected = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= n)
      .select("source", "rank", "doc_id", "n_chars")
      .orderBy("source", "rank")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // every source is capped; the hot source is actually cut
    assert(got.groupBy(_._1).values.forall(_.size <= n))
    assert(got.count(_._1 == "hot") == n)
  }

  test("writeShards materializes the packing plan: every doc once, plan-exact shards, one file per shard") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    CorpusPrep.writeShards(spark, sf0001, out)

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, n_tokens BIGINT, text STRING")
    val lines = spark.read.text(out)
      .select(col("shard_id").cast("long").as("shard_id"),
        from_json(col("value"), schema).as("j"))
      .select("shard_id", "j.doc_id", "j.n_tokens", "j.text")

    // read-back assignment == the packing plan, doc for doc.
    val plan = CorpusPrep.shardPacking(spark, sf0001)
    val mismatch = lines.join(plan.withColumnRenamed("shard_id", "plan_shard")
        .withColumnRenamed("n_tokens", "plan_tokens"), Seq("doc_id"), "full_outer")
      .where(col("shard_id").isNull || col("plan_shard").isNull ||
        col("shard_id") =!= col("plan_shard") ||
        col("n_tokens") =!= col("plan_tokens"))
      .count()
    assert(mismatch == 0, s"$mismatch docs diverge from the packing plan")

    // text round-trips verbatim through the JSONL encoding.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text").as("orig"))
    val altered = lines.join(docs, Seq("doc_id"))
      .where(col("text") =!= col("orig")).count()
    assert(altered == 0, s"$altered docs altered in shard files")

    // loader layout: each shard directory holds exactly one data file.
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard_id="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.startsWith("part-"))
      assert(files.length == 1,
        s"${d.getName}: ${files.length} files; repartition(shard_id) should give one")
    }
  }
}
