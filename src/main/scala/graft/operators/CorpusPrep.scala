package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation family: the operations that turn an analyzed,
  * deduplicated document set into training inputs — deterministic
  * split assignment and token-budget shard planning. (LLM-pipeline
  * extension beyond the reference surface, beside
  * [[TextAnalysis]] / [[Dedup]].)
  *
  * Everything is content-deterministic (hash buckets, stable
  * orderings) — re-running the pipeline on the same corpus yields
  * byte-identical splits and shards, which is what makes training
  * runs reproducible and the DuckDB oracle exact.
  */
object CorpusPrep {

  /** The token-counting seam for shard budgets, mirroring
    * [[Multimodal.Codec]]: shard budgets are BPE-token budgets in a
    * real training pipeline, and the tokenizer is a swappable
    * dependency, not a property of the packing algorithm. An
    * implementation maps a text Column to a LongType count Column —
    * Column-to-Column so the default stays whole-stage codegen and
    * oracle-portable; a JNI/external tokenizer plugs in here (its
    * mapPartitions form pays the codegen exit ONLY when chosen).
    * [[shardPacking]] takes the counter as a parameter and the
    * packing math never changes.
    */
  trait TokenCounter extends Serializable {
    def count(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column
  }

  /** Default: real whitespace tokenization (`\s+` over trimmed text,
    * the same rule as the token-median query) — `split(" ")` would
    * count phantom tokens on runs of spaces and miss tabs/newlines,
    * quietly bending the token budget the shards promise.
    */
  object WhitespaceCounter extends TokenCounter {
    def count(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      size(split(trim(text), "\\s+")).cast("long")
  }

  /** A deterministic BPE-shaped stand-in: each whitespace word costs
    * ceil(len/4) subword tokens (~4 chars/token, the usual BPE rule
    * of thumb). Still pure Column arithmetic — proves the seam admits
    * a counter with different numbers without touching the packing.
    */
  object SubwordCounter extends TokenCounter {
    def count(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      aggregate(split(trim(text), "\\s+"), lit(0L),
        (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long"))
  }

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** The identity-hash bucket in [0, 100): md5 of (salt + doc_id),
    * first 8 hex chars as an integer, mod 100. ONE definition for
    * every sampling decision in this module — split assignment and
    * the training-corpus composition share the unsalted form (their
    * membership must agree by construction), mixing salts with
    * `"mix|"` so its decision is independent of the split's.
    */
  private def hashBucket(salt: String, mod: Int = 100,
      key: String = "doc_id"): org.apache.spark.sql.Column = {
    val keyed = if (salt.isEmpty) s"cast($key as string)"
      else s"concat('$salt', cast($key as string))"
    expr(s"cast(conv(substr(md5(cast($keyed as binary)), 1, 8), 16, 10) as bigint) % $mod")
  }

  /** Deterministic train/val/test assignment by hash bucket:
    * `bucket = md5(doc_id)[0:8] % 100`, train below `pctTrain`, val
    * below `pctTrain + pctVal`, test otherwise — the standard
    * leakage-safe split (membership depends only on the document's
    * identity, never on partitioning, row order, or cluster size).
    * Emitted as the per-(split, lang) rollup; the per-doc form is
    * the same projection without the groupBy.
    *
    * Scale: one scan, the hash is row-local codegen, one small
    * aggregation shuffle.
    */
  def splitAssign(spark: SparkSession, dir: String,
      pctTrain: Int = 80, pctVal: Int = 10): DataFrame = {
    require(pctTrain >= 0 && pctVal >= 0 && pctTrain + pctVal <= 100,
      s"split percentages must be non-negative with pctTrain+pctVal <= 100, " +
        s"got pctTrain=$pctTrain pctVal=$pctVal")
    val bucket = hashBucket("")
    docs(spark, dir)
      .withColumn("split",
        when(bucket < pctTrain, "train")
          .when(bucket < pctTrain + pctVal, "val")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy("split", "lang")
  }

  /** Per-document near-dup-LEAKAGE-free split assignment:
    * [[splitAssign]]'s hash-bucket rule keyed by the document's
    * DUPLICATE CLUSTER instead of its own id, so two near-duplicate
    * documents can never straddle the train/eval boundary — the
    * leakage the per-identity rule cannot see (a 95%-identical eval
    * document IS a leaked training document for measurement
    * purposes; production dedup pipelines split by cluster for
    * exactly this reason). Membership key = the cluster id from the
    * DURABLE decision table ([[Dedup.clusters]] — the min-id member;
    * a document outside every verified pair is its own cluster), so
    * assignment stays deterministic and identity-stable, is constant
    * within a cluster BY CONSTRUCTION (`CorpusPrepSpec` asserts no
    * cluster straddles), and a cluster's split equals its keeper's
    * [[splitAssign]] split (the key is the keeper's id).
    *
    * Scale: one corpus scan left-joined against the thin durable
    * cluster table on doc_id, the same row-local hash, one rollup —
    * [[splitAssign]] plus one key-join against an artifact the dedup
    * family already pays for once per crawl.
    */
  def splitLeakfreePerDoc(spark: SparkSession, dir: String,
      pctTrain: Int = 80, pctVal: Int = 10): DataFrame = {
    require(pctTrain >= 0 && pctVal >= 0 && pctTrain + pctVal <= 100,
      s"split percentages must be non-negative with pctTrain+pctVal <= 100, " +
        s"got pctTrain=$pctTrain pctVal=$pctVal")
    val clusters = Dedup.clusters(spark, dir).select("doc_id", "cluster_id")
    val bucket = hashBucket("", key = "skey")
    docs(spark, dir)
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("skey", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(bucket < pctTrain, "train")
          .when(bucket < pctTrain + pctVal, "val")
          .otherwise("test"))
  }

  /** The registered rollup of [[splitLeakfreePerDoc]] — the
    * [[splitAssign]] output shape, so the two rules' corpus-level
    * effects compare cell for cell.
    */
  def splitLeakfree(spark: SparkSession, dir: String,
      pctTrain: Int = 80, pctVal: Int = 10): DataFrame =
    splitLeakfreePerDoc(spark, dir, pctTrain, pctVal)
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy("split", "lang")

  /** Reproducibility manifest — the data-card artifact a corpus
    * release ships: per (split, source), the document count, char
    * sum, and an ORDER-INDEPENDENT content checksum, so two
    * independently-produced copies of "the same" corpus can be
    * compared cell-by-cell without sorting either one.
    *
    * Checksum: sum of `md5(doc_id|md5(text))[0:8]` as a 32-bit
    * integer per document. Summing (not xor-folding through an
    * aggregation order) keeps it exact-integer and portable to the
    * DuckDB oracle; each term is < 2^32, so a BIGINT sum holds
    * ~2^31 documents per cell before overflow — beyond any
    * per-(split, source) cell of a real corpus, and the bound is
    * documented rather than silent. Binding doc_id INTO the hash
    * means a swapped id/text pairing changes the checksum even when
    * the multiset of texts is unchanged.
    *
    * Scale posture: one scan, row-local codegen'd hashing, one
    * small rollup shuffle with map-side partials.
    */
  def manifest(spark: SparkSession, dir: String,
      pctTrain: Int = 80, pctVal: Int = 10): DataFrame =
    manifestOf(docs(spark, dir), pctTrain, pctVal)

  /** [[manifest]] over an arbitrary documents frame (fixture seam). */
  def manifestOf(documents: DataFrame,
      pctTrain: Int = 80, pctVal: Int = 10): DataFrame = {
    val bucket = hashBucket("")
    documents
      .withColumn("split",
        when(bucket < pctTrain, "train")
          .when(bucket < pctTrain + pctVal, "val")
          .otherwise("test"))
      .withColumn("term", expr(
        """cast(conv(substr(md5(cast(concat(cast(doc_id as string), '|',
           md5(cast(text as binary))) as binary)), 1, 8), 16, 10) as bigint)"""))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        sum(col("term")).cast("long").as("checksum"))
      .orderBy("split", "source")
  }

  /** The capstone composition — the final training corpus as ONE
    * query: documents that (1) pass the Gopher quality flags,
    * (2) survive near-dup cluster resolution (keepers and
    * singletons), and (3) land in the train split, with real token
    * counts. This is the frame a training run actually reads, and
    * the proof the families COMPOSE: quality semi-join, anti-join
    * against the O(near-dups) drop list, row-local hash bucket —
    * all filters stacked on the same corpus scan.
    *
    * Like [[Dedup.keptCorpus]], the drop-list anti-join is
    * deliberately hint-free: at web-crawl dup-rates the drop list is
    * corpus-proportional and a forced broadcast is an OOM, not a slow
    * plan. AQE still broadcasts it when it measures small.
    */
  def trainingCorpus(spark: SparkSession, dir: String,
      pctTrain: Int = 80, minTokens: Int = 30,
      maxTokens: Int = 100000): DataFrame = {
    require(pctTrain >= 0 && pctTrain <= 100,
      s"pctTrain must be in [0,100], got $pctTrain")
    val quality = TextAnalysis.qualityFlags(spark, dir, minTokens, maxTokens)
      .where(col("quality_pass") === 1L).select("doc_id")
    docs(spark, dir)
      .join(quality, Seq("doc_id"), "left_semi")
      .join(Dedup.dropList(spark, dir), Seq("doc_id"), "left_anti")
      .where(hashBucket("") < pctTrain)
      // ONE token-count definition ([[WhitespaceCounter]]) shared
      // with shard packing, so corpus and shard budgets agree.
      .select(col("doc_id"), col("lang"), col("source"),
        WhitespaceCounter.count(col("text")).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Distinct word `n`-grams per document over the canonical cleaned
    * tokens — the unit of benchmark-overlap decontamination. Docs with
    * fewer than `n` tokens (or an empty cleaning) have no n-grams and
    * emit no row, as in [[TextAnalysis.repetitionOf]].
    */
  private def ngramsOf(documents: DataFrame, n: Int): DataFrame =
    // guard-free total form (the TextAnalysis.winnowOf pattern): the
    // CASE-guarded gramsSql yields array() below n tokens, so the
    // explode emits nothing for short docs — a `.where` would only
    // duplicate split(clean(text)) into a pushed-down filter,
    // cleaning every document twice.
    documents
      .select(col("doc_id"),
        split(graft.functions.Tokenize.clean(col("text")), " ").as("t"))
      .select(col("doc_id"),
        explode(array_distinct(expr(graft.functions.Tokenize.gramsSql("t", n))))
          .as("gram"))
      // cross-row SET union per doc identity (the Dedup.shinglesOf
      // contract, round-13 degenerate hash gate): a re-crawled
      // duplicate doc_id must not double-count its grams in the
      // contamination denominator
      .dropDuplicates("doc_id", "gram")

  /** Benchmark decontamination: for every training document, how many
    * of its distinct word `n`-grams also appear in the evaluation
    * set — the standard pre-training hygiene step that stops a model
    * from being graded on text it memorized (published as 13-gram
    * overlap filtering in the GPT-3 appendix; `n` = 5 here because the
    * synthetic corpus' documents are short). Emits EVERY training doc
    * with its distinct-gram count, hit count, contamination in basis
    * points, and a `flagged` indicator (any overlap), so the frame is
    * stable even when the corpus is clean.
    *
    * Scale posture (100 TB): n-grams derive per row (transform over
    * the token array — no self-join); each side is then ONE distinct
    * gram frame; the overlap is a single equi-join on `gram` followed
    * by a (doc_id)-keyed aggregation with map-side partials. The eval
    * side is benchmark-sized (thousands of docs, not the corpus), so
    * AQE broadcasts it when it measures small — the hint is
    * deliberately omitted, like the dedup drop list: a pathological
    * eval set must degrade to a shuffled join, not an OOM.
    */
  def decontaminateAgainst(train: DataFrame, evalDocs: DataFrame,
      n: Int = 5): DataFrame = {
    val evalG = ngramsOf(evalDocs, n).select("gram").distinct()
      .withColumn("hit", lit(1L))
    ngramsOf(train, n)
      .join(evalG, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_doc_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("contam_bp",
        expr("cast((n_hits * 10000) div greatest(n_doc_grams, 1) as bigint)"))
      .withColumn("flagged", when(col("n_hits") > 0, 1L).otherwise(0L))
      .orderBy("doc_id")
  }

  /** [[decontaminateAgainst]] with the corpus split into train/eval by
    * the deterministic identity hash `doc_id % evalMod` — the
    * registered stand-in for an external benchmark table (in a real
    * pipeline the eval side is the benchmark suite's own documents;
    * the operator above takes any two frames).
    */
  def decontaminate(spark: SparkSession, dir: String,
      n: Int = 5, evalMod: Int = 23): DataFrame = {
    val d = docs(spark, dir)
    decontaminateAgainst(
      d.where(col("doc_id") % evalMod =!= 0),
      d.where(col("doc_id") % evalMod === 0), n)
  }

  /** Semantic decontamination — the embedding-space twin of
    * [[decontaminate]] (real pipelines run BOTH: exact n-gram overlap
    * catches verbatim leakage, embedding proximity catches
    * paraphrased eval material the gram join is blind to). Train-side
    * documents are scored by their sign-LSH-candidate,
    * exact-cosine-verified hits against the eval side
    * ([[Similarity.lshEvalHits]] — train-vs-eval banded join, never
    * train x train); every train-side embedded doc gets a row
    * (left join), with `max_cos_bp = -10000` as the no-hit sentinel
    * (cosine's floor) so the schema stays integer-total. Split is
    * the registered stand-in `vec_id % evalMod` ([[decontaminate]]'s
    * convention); the operator pair generalizes to any two frames.
    */
  def semanticDecontaminate(spark: SparkSession, dir: String,
      minCosBp: Int = 3000, evalMod: Int = 23): DataFrame = {
    val hits = Similarity.lshEvalHits(spark, dir, evalMod, minCosBp)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_hits"), max("cos_bp").as("max_cos_bp"))
    Similarity.quantized(spark, dir)
      .where(col("vec_id") % evalMod =!= 0)
      .select(col("vec_id").as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_eval_hits"), lit(0L)).cast("long").as("n_eval_hits"),
        coalesce(col("max_cos_bp"), lit(-10000L)).cast("long").as("max_cos_bp"),
        when(col("n_eval_hits").isNotNull, 1L).otherwise(0L).as("flagged"))
      .orderBy("doc_id")
  }

  /** Weighted source mixing: downsample each source to a target rate
    * (parts-per-hundred) — the corpus-mixing step that reweights
    * heterogeneous sources before training. Identity-hash
    * deterministic like [[splitAssign]], but SALTED differently
    * (`mix|` prefix): sampling with the split hash would correlate
    * the two decisions and bias val/test composition. Sources
    * without an explicit rate take `defaultRate`. Emitted as the
    * per-source rollup (total, kept, kept chars) so the achieved mix
    * is auditable against the requested one; the kept per-doc frame
    * is the same predicate without the groupBy.
    */
  def mixture(spark: SparkSession, dir: String,
      rates: Map[String, Int] = Map("src0" -> 100, "src1" -> 50, "src2" -> 25),
      defaultRate: Int = 75): DataFrame = {
    val bucket = hashBucket("mix|")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col("source") === src, lit(r)).otherwise(acc)
    }
    docs(spark, dir)
      .withColumn("rate_pct", rate.cast("long"))
      .withColumn("kept", when(bucket < col("rate_pct"), 1L).otherwise(0L))
      .groupBy("source")
      .agg(max("rate_pct").as("rate_pct"),
        count(lit(1)).as("n_total"),
        sum("kept").cast("long").as("n_kept"),
        sum(col("kept") * col("n_chars")).cast("long").as("kept_chars"))
      .orderBy("source")
  }

  /** Temperature-balanced source mixing (the multilingual-pretraining
    * upweighting rule, alpha = 1/2): each source's target share is
    * proportional to `n_s^alpha` rather than `n_s`, flattening the
    * head so rare sources aren't drowned (the mT5 / XLM-R sampling
    * scheme; alpha = 1/2 here because sqrt has an EXACT integer form
    * — `isqrt` — keeping every number engine-portable bigint, no
    * float ever crossing the oracle boundary).
    *
    * Realized by pure downsampling: keep fraction
    * `f_s = C * w_s / n_s` with `w_s = isqrt(n_s)` and
    * `C = min_t n_t / w_t`, so the most-downweighted source keeps
    * 100 % and every share lands proportional to `w_s`. The argmin is
    * taken on the exact scaled integer `n*10^12 div w` (distinct
    * rationals with denominators <= 10^5 differ by >= 10^2 at that
    * scale, so the floor cannot collide), tie-broken by source name.
    * isqrt = floor(sqrt(double)) corrected by +-1 in exact bigint —
    * immune to any sqrt rounding.
    *
    * The keep decision is the module's identity-hash bucket at basis
    * -point granularity, salted `alpha|` so it is independent of both
    * the split and the plain mixture. Emitted as the per-source audit
    * rollup (total, weight, realized rate, kept docs/chars).
    *
    * Scale posture (100 TB): the stats frame is O(|sources|) — two
    * tiny self-derived frames (weights, the 1-row argmin) broadcast
    * by construction; the corpus streams ONCE through a row-local
    * hash and a source-keyed rollup with map-side partials.
    */
  def alphaMixture(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val st = d.groupBy("source").agg(count(lit(1)).as("n_total"))
    val wt = st
      .withColumn("w0", expr("cast(floor(sqrt(cast(n_total as double))) as bigint)"))
      .withColumn("w1", col("w0") -
        when(col("w0") * col("w0") > col("n_total"), 1L).otherwise(0L))
      .withColumn("weight", col("w1") +
        when((col("w1") + 1) * (col("w1") + 1) <= col("n_total"), 1L).otherwise(0L))
      .select("source", "n_total", "weight")
    val r = wt.withColumn("ratio", expr("(n_total * 1000000000000) div weight"))
    val m = r.orderBy("ratio", "source").limit(1)
      .select(col("n_total").as("n_m"), col("weight").as("w_m"))
    // 1-row aggregate: broadcast is bounded by construction.
    val rates = r.crossJoin(broadcast(m))
      .withColumn("rate_bp", expr("(10000 * n_m * weight) div (w_m * n_total)"))
      .select("source", "n_total", "weight", "rate_bp")
    d.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("bucket", hashBucket("alpha|", 10000))
      .join(rates, Seq("source"))
      .withColumn("kept", when(col("bucket") < col("rate_bp"), 1L).otherwise(0L))
      .groupBy("source")
      .agg(max("n_total").as("n_total"), max("weight").as("weight"),
        max("rate_bp").as("rate_bp"),
        sum("kept").cast("long").as("n_kept"),
        sum(col("kept") * col("n_chars")).cast("long").as("kept_chars"))
      .orderBy("source")
  }

  /** Token-budget shard planning: documents packed into shards of at
    * most ~`budget` whitespace tokens in doc_id order —
    * `shard_id = floor(tokens_before / budget)` (a document straddling
    * a boundary belongs to the shard its first token falls in, the
    * greedy packing rule).
    *
    * The running total is computed in the DISTRIBUTED two-pass form,
    * not a global window: a single `Window.orderBy(doc_id)` is a
    * one-reducer sort — the classic scale trap for running totals.
    * Instead (1) docs bucket by `doc_id div bucketSize`; per-bucket
    * prefix sums window WITHIN each bucket; (2) the per-bucket totals
    * — a rows-per-bucket-fold smaller frame — prefix-sum on one
    * reducer legitimately (thousands of buckets, not billions of
    * docs) and broadcast back as offsets. Same numbers as the global
    * window, shuffle-bounded by the bucket count. The DuckDB oracle
    * runs the plain global running sum, proving the two forms equal.
    *
    * Sizing rule: the across-bucket pass puts ONE thin row per bucket
    * on a single reducer, so `bucketSize` must scale as ~sqrt(N) to
    * keep both passes bounded (10^9 docs -> bucketSize ~3*10^4 ->
    * ~3*10^4 offset rows); at the default 100 a 10^9-doc corpus would
    * put 10^7 rows on that reducer. Beyond sqrt-sizing, the two-pass
    * recurses: the offset frame is itself a `(doc_id=bucket,
    * n_tokens=btotal)` input to the same algorithm.
    */
  def shardPacking(spark: SparkSession, dir: String,
      budget: Long = 4096L, bucketSize: Long = 100L,
      counter: TokenCounter = WhitespaceCounter): DataFrame =
    shardPackingOf(
      docs(spark, dir).select(col("doc_id"),
        counter.count(col("text")).as("n_tokens")),
      budget, bucketSize)

  /** The shared two-pass core: `(doc_id, n_tokens, tokens_before)`
    * with the global running total computed distributed (per-bucket
    * windows + a thin broadcast offset frame — see [[shardPacking]]).
    */
  private def packedOf(sized: DataFrame, bucketSize: Long): DataFrame = {
    val base = sized
      .select(col("doc_id"), col("n_tokens"),
        expr(s"doc_id div $bucketSize").as("bucket"))
    // n_tokens as the running-total tiebreaker: duplicate doc_ids
    // (re-crawl rows) make ORDER BY doc_id alone underdetermined, and
    // an underdetermined prefix sum is nondeterministic exactly at
    // shard boundaries (round-13 review; rows tied on BOTH keys are
    // interchangeable — identical outputs either way). Oracle windows
    // carry the same tiebreak.
    val inBucket = Window.partitionBy("bucket").orderBy("doc_id", "n_tokens")
      .rowsBetween(Window.unboundedPreceding, -1)
    val acrossBuckets = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("bucket")
      .agg(sum("n_tokens").as("btotal"))
      .withColumn("offset", coalesce(sum("btotal").over(acrossBuckets), lit(0L)))
      .select("bucket", "offset")
    base
      .withColumn("within", coalesce(sum("n_tokens").over(inBucket), lit(0L)))
      .join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"), col("n_tokens"),
        (col("within") + col("offset")).as("tokens_before"))
  }

  /** [[shardPacking]] over a prepared `(doc_id, n_tokens)` frame. */
  def shardPackingOf(sized: DataFrame,
      budget: Long, bucketSize: Long): DataFrame =
    packedOf(sized, bucketSize)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"cast(tokens_before div $budget as bigint)").as("shard_id"))
      .orderBy("doc_id")

  /** The RECURSIVE two-pass running sum (round-10): [[packedOf]]'s
    * across-bucket pass windows one thin row per bucket on a single
    * reducer — fine under the ~sqrt(N) sizing rule, a one-reducer
    * bottleneck beyond it (10^12 docs at bucketSize 10^4 is 10^8
    * offset rows on one task). This form closes the gap the
    * [[shardPacking]] scaladoc only promised: the offsets frame is
    * ITSELF prefix-summed by the same bucketed rule, recursing until
    * a level fits inside one `bucketSize`-row window — so NO stage,
    * at any corpus size, ever sorts more than `bucketSize` rows on
    * one reducer, and the level count is log_bucketSize(N) (3 levels
    * cover 10^12 docs at bucketSize 10^4). Exactly the numbers of
    * the global window and of [[packedOf]] under the same bucketing
    * (the DuckDB oracle runs the global form; `ShardPackRecSpec`
    * pins equality on adversarial sizes and that recursion engages).
    * The per-level `count()` that decides termination is a
    * metadata-sized footer read, log-many times.
    */
  def packedOfRecursive(sized: DataFrame, bucketSize: Long): DataFrame = {
    // level 0 keeps the caller's ROWS and joins its offsets by
    // BUCKET (the packedOf shape): a rejoin by doc_id was quadratic
    // on re-crawled duplicate ids — two rows of one id came back
    // 2x2 (round-13 degenerate hash gate). The recursion itself is
    // safe: bucket ids are dense and distinct at every deeper level.
    val base = sized
      .withColumn("bucket", expr(s"doc_id div $bucketSize"))
    // (doc_id, n_tokens) tiebreak: the packedOf convention.
    val inBucket = Window.partitionBy("bucket").orderBy("doc_id", "n_tokens")
      .rowsBetween(Window.unboundedPreceding, -1)
    // persisted for the same reason as exclusivePrefix's levels: the
    // recursion runs an action (its termination count) then windows
    // the same thin frame.
    val btotals = base.groupBy("bucket").agg(sum("n_tokens").as("v"))
      .select(col("bucket").as("id"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = exclusivePrefix(btotals, bucketSize)
      .select(col("id").as("bucket"), col("before").as("offset"))
    base
      .withColumn("within", coalesce(sum("n_tokens").over(inBucket), lit(0L)))
      // hint-free (see exclusivePrefix's join note)
      .join(offsets, Seq("bucket"))
      .select(col("doc_id"), col("n_tokens"),
        (col("within") + col("offset")).as("tokens_before"))
  }

  /** Exclusive prefix sum of `v` in `id` order, never windowing more
    * than `bucketSize` rows in one partition: buckets window within,
    * bucket totals recurse. Terminates: each level divides the row
    * count by `bucketSize` (ids at level k are dense bucket indexes),
    * and a level at or under `bucketSize` rows pays the one bounded
    * global window legitimately.
    */
  private def exclusivePrefix(df: DataFrame, bucketSize: Long): DataFrame =
    if (df.count() <= bucketSize)
      df.withColumn("before",
        coalesce(sum("v").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("id", "before")
    else {
      val base = df.withColumn("bucket", expr(s"id div $bucketSize"))
      val inBucket = Window.partitionBy("bucket").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
      // bucket totals PERSISTED before recursing (round-11 ADVICE):
      // the next level runs an ACTION on them (the termination
      // count()) and then windows the same frame — unpersisted, each
      // deeper level would recompute the entire upstream aggregation
      // chain (corpus scan + k groupBys) twice per level. The frame
      // is thin by construction (<= N/bucketSize two-column rows,
      // spill-safe at any scale); level 0 — the caller's corpus-sized
      // frame — is deliberately NOT cached: its double evaluation is
      // one extra scan+project, cheaper than caching a corpus.
      // Eviction reclaims the thin levels; explicit unpersist would
      // fire before the caller materializes the lazy result.
      val btotals = base.groupBy("bucket").agg(sum("v").as("v"))
        .select(col("bucket").as("id"), col("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val offsets = exclusivePrefix(btotals, bucketSize)
        .select(col("id").as("bucket"), col("before").as("offset"))
      base
        .withColumn("within", coalesce(sum("v").over(inBucket), lit(0L)))
        // deliberately HINT-FREE (unlike packedOf's √N-sized offsets,
        // which are broadcast-small by the sizing rule): level-1
        // offsets are N/bucketSize rows — broadcastable at demo
        // scale, shuffle-joined at 10^12 docs — and the stats-driven
        // choice is the point of removing the sizing obligation.
        .join(offsets, Seq("bucket"))
        .select(col("id"), (col("within") + col("offset")).as("before"))
    }

  /** [[shardPackingOf]] through the recursive prefix sum — registered
    * with a deliberately TINY bucketSize so the verify corpus
    * recurses multiple levels under the oracle gate (the output is
    * bucketing-independent; the oracle is the same global window).
    */
  def shardPackingRecursive(spark: SparkSession, dir: String,
      budget: Long = 4096L, bucketSize: Long = 8L,
      counter: TokenCounter = WhitespaceCounter): DataFrame =
    packedOfRecursive(
      docs(spark, dir).select(col("doc_id"),
        counter.count(col("text")).as("n_tokens")),
      bucketSize)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"cast(tokens_before div $budget as bigint)").as("shard_id"))
      .orderBy("doc_id")

  /** The loader-ready face of the packing: where each document's
    * tokens LAND inside its packed fixed-length training sequence —
    * `seq_id` (= the shard), the 0-based `start_offset` within the
    * sequence, and `spills` marking documents whose tokens cross the
    * sequence boundary (the greedy rule assigns the doc to the
    * sequence its first token falls in; a loader continues it into
    * the next sequence or truncates — its policy, our map either
    * way). Everything derives row-locally from the same
    * `tokens_before` running total as [[shardPacking]], so the two
    * views cannot disagree.
    */
  def sequenceMap(spark: SparkSession, dir: String,
      budget: Long = 4096L, bucketSize: Long = 100L,
      counter: TokenCounter = WhitespaceCounter): DataFrame =
    packedOf(
      docs(spark, dir).select(col("doc_id"),
        counter.count(col("text")).as("n_tokens")),
      bucketSize)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"cast(tokens_before div $budget as bigint)").as("seq_id"),
        expr(s"tokens_before % $budget").as("start_offset"),
        expr(s"cast(case when tokens_before % $budget + n_tokens > $budget " +
          "then 1 else 0 end as bigint)").as("spills"))
      .orderBy("doc_id")

  /** Epoch-shuffled sequence packing: every training epoch reads the
    * corpus in a DIFFERENT deterministic order — `md5(epoch|doc_id)`
    * is the epoch's permutation key, so each epoch is a fresh,
    * seed-free, restart-stable shuffle (re-running epoch 3 after a
    * crash replays exactly epoch 3's order; no RNG state to persist)
    * — and each epoch's documents pack into fixed token-budget
    * sequences through the SAME two-pass running total as
    * [[shardPacking]], keyed here by the permutation hash instead of
    * doc_id.
    *
    * The two-pass form under a hash order: the hash's first two hex
    * chars are the bucket (256 buckets), so (bucket, hash) order IS
    * global hash order — within-bucket prefix windows partition on
    * (epoch, bucket), and the 256·E-row offset frame prefix-sums per
    * epoch and broadcasts back. The oracle runs the per-epoch GLOBAL
    * window, proving the two forms equal. The E-fold row expansion
    * is a map-side explode over the doc-METADATA frame (id + token
    * count), never the text bytes: shuffled volume is E × |docs|
    * thin rows, not E corpora.
    *
    * Output restricted to every `outMod`-th document (the packing is
    * computed over ALL docs; the filter only bounds the emitted
    * sample) — `(epoch, doc_id, n_tokens, seq_id, start_offset)`.
    */
  def epochPack(spark: SparkSession, dir: String, epochs: Int = 3,
      budget: Long = 4096L, outMod: Long = 50L,
      counter: TokenCounter = WhitespaceCounter): DataFrame = {
    // sequence(0, epochs-1) with epochs <= 0 would flip to a
    // DESCENDING sequence ([0, -1], Spark's default-step rule) and
    // emit phantom epochs instead of nothing (round-8 self-review
    // finding) — reject the nonsensical input loudly.
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val base = docs(spark, dir)
      .select(col("doc_id"), counter.count(col("text")).as("n_tokens"))
      .withColumn("epoch", explode(sequence(lit(0L), lit(epochs - 1L))))
      .withColumn("okey", expr(
        "md5(cast(concat(cast(epoch as string), '|', cast(doc_id as string)) as binary))"))
      .withColumn("bucket", expr("substring(okey, 1, 2)"))
    // duplicate doc_ids share an okey too (it derives from the id),
    // so n_tokens is the final tiebreak (the packedOf convention).
    val inBucket = Window.partitionBy("epoch", "bucket")
      .orderBy("okey", "doc_id", "n_tokens")
      .rowsBetween(Window.unboundedPreceding, -1)
    val acrossBuckets = Window.partitionBy("epoch").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("epoch", "bucket")
      .agg(sum("n_tokens").as("btotal"))
      .withColumn("offset",
        coalesce(sum("btotal").over(acrossBuckets), lit(0L)))
      .select("epoch", "bucket", "offset")
    base
      .withColumn("within", coalesce(sum("n_tokens").over(inBucket), lit(0L)))
      .join(broadcast(offsets), Seq("epoch", "bucket"))
      .withColumn("tokens_before", col("within") + col("offset"))
      .where(col("doc_id") % outMod === 0)
      .select(col("epoch"), col("doc_id"), col("n_tokens"),
        expr(s"cast(tokens_before div $budget as bigint)").as("seq_id"),
        expr(s"tokens_before % $budget").as("start_offset"))
      .orderBy("epoch", "doc_id")
  }

  /** Per-source document cap: keep the `n` largest documents of each
    * source (by `n_chars` desc, doc_id asc tie-break) — the per-domain
    * cap every crawl pipeline applies so no single domain dominates
    * the training mixture.
    *
    * Computed with the bounded [[TopK]] aggregator, NOT a per-source
    * window: a window must co-locate and sort EVERY document of a
    * source on one partition before discarding all but n — for a hot
    * domain (the exact case the cap exists for) that is a straggler
    * sort of the offender's full posting. The aggregator keeps O(n)
    * state per source in each partition's partial, so the shuffle
    * moves n rows per source regardless of domain skew. The DuckDB
    * oracle runs the window formulation — hash equality proves the
    * bounded rewrite exact (the same twin-proof contract as
    * `sim_cosine_topk` / `prep_shard_packing`).
    */
  def sourceCap(spark: SparkSession, dir: String, n: Int = 10): DataFrame =
    sourceCapOf(docs(spark, dir), n)

  /** [[sourceCap]] over an arbitrary `(source, doc_id, n_chars)`
    * frame (fixture seam).
    */
  def sourceCapOf(documents: DataFrame, n: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // score = n_chars: exact in Double far beyond any document size.
    documents.select(col("source"), col("doc_id"),
        col("n_chars").cast("long").as("n_chars"))
      .as[(String, Long, Long)]
      .map { case (src, id, nc) => (src, TopK.Scored(0L, nc.toDouble, id, nc)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopK.TopKAggregator(n).toColumn.name("top"))
      .flatMap { case (src, items) =>
        items.iterator.zipWithIndex.map { case (s, i) =>
          (src, (i + 1).toLong, s.id, s.payload)
        }
      }
      .toDF("source", "rank", "doc_id", "n_chars")
      .orderBy("source", "rank")
  }

  /** Quality-tier importance resampling — the DCLM/FineWeb-style
    * step between filtering and mixing: instead of a binary
    * keep/drop, each document's keep RATE follows its quality tier
    * (`high` = passes the Gopher flags with substantial length,
    * `mid` = passes but short, `low` = fails — kept at a trickle so
    * the distribution tail isn't zeroed out, the importance-sampling
    * posture). The keep decision is the module's one identity-hash
    * bucket under its own salt (`"qr|"`), so it is independent of
    * the split/mixture decisions and reproducible by construction.
    *
    * Emitted as the per-(tier, lang) rollup a pipeline report shows:
    * rate, totals, kept counts, kept char/token mass.
    *
    * Scale: the tier needs [[TextAnalysis.stats]] (persisted, shared
    * with every text query) and the flags derived from it —
    * doc_id-keyed joins on the persisted frame, row-local hash,
    * one small rollup shuffle with map-side partials.
    */
  def qualityResample(spark: SparkSession, dir: String,
      rateHigh: Int = 100, rateMid: Int = 60, rateLow: Int = 10,
      minTokens: Int = 30, maxTokens: Int = 100000,
      highTokens: Int = 100): DataFrame = {
    require(Seq(rateHigh, rateMid, rateLow).forall(r => r >= 0 && r <= 100),
      s"rates must be percentages, got high=$rateHigh mid=$rateMid low=$rateLow")
    // n_chars from the COMPUTED stats, not the documents metadata
    // column: a crawl's stored n_chars is unverified metadata that
    // can contradict the text (the degenerate lake plants exactly
    // that), and the kept-volume accounting must describe the bytes
    // actually kept (round-13 hash gate; identical where metadata is
    // honest).
    val st = TextAnalysis.stats(spark, dir)
      .select(col("doc_id"), col("n_ws_tokens"), col("n_chars"))
    val qf = TextAnalysis.qualityFlags(spark, dir, minTokens, maxTokens)
      .select(col("doc_id"), col("quality_pass"))
    val tier = when(col("quality_pass") === 1L && col("n_ws_tokens") >= highTokens, "high")
      .when(col("quality_pass") === 1L, "mid")
      .otherwise("low")
    docs(spark, dir).select(col("doc_id"), col("lang"))
      .join(st, Seq("doc_id"))
      .join(qf, Seq("doc_id"))
      .withColumn("tier", tier)
      .withColumn("rate_pct",
        when(col("tier") === "high", rateHigh.toLong)
          .when(col("tier") === "mid", rateMid.toLong)
          .otherwise(rateLow.toLong))
      .withColumn("kept",
        when(hashBucket("qr|") < col("rate_pct"), 1L).otherwise(0L))
      .groupBy("tier", "lang")
      .agg(max(col("rate_pct")).as("rate_pct"),
        count(lit(1)).as("n_total"),
        sum(col("kept")).cast("long").as("n_kept"),
        sum(col("kept") * col("n_chars")).cast("long").as("kept_chars"),
        sum(col("kept") * col("n_ws_tokens")).cast("long").as("kept_tokens"))
      .orderBy("tier", "lang")
  }

  /** Overlapping fixed-window character chunking — the
    * retrieval/embedding prep step (every RAG or embedding pipeline
    * slices documents into model-window-sized pieces with an overlap
    * so no span is split across a boundary without context). Chunk
    * `i` of a document covers characters `[i*stride, i*stride +
    * window)`; the chunk count `ceil(max(n - window, 0) / stride) +
    * 1` guarantees full coverage (the last window always reaches the
    * end because `stride <= window`) with no empty chunks.
    *
    * Character windows, not token windows, deliberately: the chunk
    * boundary must be computable row-locally in pure codegen
    * arithmetic in BOTH engines; a tokenizer-aware chunker plugs the
    * same offsets formula over a [[TokenCounter]]-style seam.
    *
    * Scale: zero shuffles — scan, row-local `sequence` explode
    * (fan-out ~n/stride per doc, bounded by document length),
    * row-local substring. The output order (`doc_id, chunk_id`) is
    * the input order, so the final sort is a per-partition no-op at
    * scale (dropped entirely when the caller streams to a sink).
    */
  def chunks(spark: SparkSession, dir: String,
      window: Int = 400, stride: Int = 300): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs(spark, dir)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .where(col("n") > 0)
      .withColumn("n_chunks",
        expr(s"cast((greatest(n - $window, 0) + ${stride - 1}) div $stride as int) + 1"))
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"))
      .withColumn("start", (col("chunk_id") * stride + 1).cast("long"))
      .withColumn("chunk", expr(s"substr(text, cast(start as int), $window)"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("start"), length(col("chunk")).cast("long").as("chunk_len"),
        col("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Materialize the packed shards as JSONL training files — the
    * sink a loader actually opens, closing the loop from packing
    * PLAN ([[shardPacking]]) to bytes on disk. Layout:
    * `outPath/shard_id=K/part-*.txt`, one JSON line per document
    * (`doc_id`, `n_tokens`, `text` — fixed field order, so output
    * is byte-deterministic given the corpus); each shard directory
    * is self-contained and lists directly into a data loader.
    *
    * Scale posture: the shard assignment reuses the one packing
    * running total; the write is ONE hash repartition on shard_id
    * (each shard's lines land in one task → one file per shard, the
    * loader-friendly layout) with a within-partition sort by
    * (shard_id, doc_id) — per-task spillable sort, no global sort,
    * no driver involvement. At 100 TB this is the same shape as the
    * snapshot writers: shuffle once, stream each partition to disk.
    */
  def writeShards(spark: SparkSession, dir: String, outPath: String,
      budget: Long = 4096L, bucketSize: Long = 100L,
      counter: TokenCounter = WhitespaceCounter): String = {
    val d = docs(spark, dir)
    val packed = shardPackingOf(
      d.select(col("doc_id"), counter.count(col("text")).as("n_tokens")),
      budget, bucketSize)
    d.select(col("doc_id"), col("text"))
      .join(packed, Seq("doc_id"))
      .select(col("shard_id"),
        to_json(struct(col("doc_id"), col("n_tokens"), col("text")))
          .as("value"))
      .repartition(col("shard_id"))
      .sortWithinPartitions("shard_id", "doc_id")
      .write.mode("overwrite").partitionBy("shard_id").text(outPath)
    outPath
  }
}
