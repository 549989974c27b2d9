package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.GraftQuery
import graft.text.TextFns._

/** Deduplication operators over `documents` — exact, n-gram Jaccard,
  * MinHash+LSH, and SimHash near-dup. The 100 TB design rule throughout:
  * NEVER materialize the O(n^2) pair space. Candidates come from
  * equality joins on content-derived keys (DF-capped shingles, LSH band
  * hashes, SimHash bands), so the shuffle volume is O(corpus) + O(true pairs),
  * and every join is a plain hash join Catalyst can partition freely.
  */
object DedupQueries {

  val ShingleN = 3
  val MinhashShingleN = 2
  val MinhashK = 12
  /** 4 bands of 3 rows: candidate P = 1-(1-J^3)^4. Chosen against the
    * corpus's background 2-gram Jaccard (~0.03-0.05 between random docs):
    * 2-row bands admitted ~100k candidate pairs at sf0.1; 3-row bands admit
    * ~3k while still catching J>=0.5 pairs with ~40% per-pass probability.
    */
  val BandRows = 3

  /** Document-frequency cap for the exact n-gram inverted index: shingles
    * present in more than this many documents are corpus boilerplate and
    * are dropped BEFORE the self-join. The pair space of an inverted-index
    * join is Σ(posting-list²) — one shingle shared by p docs contributes
    * p(p-1)/2 candidate pairs, so corpus-hot shingles make the join
    * quadratic in corpus size. Capping DF bounds every posting list, making
    * the join cost ≤ docs·shingles·DfCap — linear in the corpus. (Near-dup
    * evidence lives in RARE shingles; boilerplate shared by >64 docs has no
    * discriminating power, which is why DF-capping is the standard trick in
    * large-scale near-dup mining.) Jaccard is then computed over the CAPPED
    * shingle sets on both engines, so the oracle stays exact.
    */
  val NgramDfCap = 64

  /** Span width (tokens) for exact-substring dedup: two docs sharing ONE
    * 8-token window share a verbatim 8-word substring — the "exact
    * substring" evidence class (reused boilerplate, quoted passages,
    * copy-paste) that set-similarity measures dilute: a 600-word doc
    * quoting a 40-word passage has Jaccard ~0.06 against its source,
    * invisible to the J >= 0.5 near-dup screen, but 33 shared 8-token
    * spans here. Candidate generation is the same DF-capped inverted
    * index as the n-gram path, so the pair space stays linear.
    */
  val SpanN = 8

  /** SimHash banding: 4 disjoint 15-bit bands of the 60-bit fingerprint.
    * Two docs within Hamming distance 3 share at least one band (pigeonhole)
    * and each band key has 2^15 values — vs the 2^16 TOTAL bucket space of
    * the old 2x16-bit scheme over 32 bits, this keeps per-bucket membership
    * (and the within-bucket all-pairs verify) bounded as the corpus scales.
    */
  val SimhashBands = 4
  val SimhashBandBits = 15

  /** Bucket-size cap for the LSH band joins (MinHash bands AND SimHash
    * bands). The band self-join's pair space is Σ(bucket²) — one band key
    * shared by m docs contributes m(m-1)/2 candidate pairs, so a single
    * boilerplate-heavy key (empty docs, templated pages, licence headers)
    * makes the join quadratic in corpus size no matter how good the
    * banding is. Buckets larger than the cap are dropped BEFORE the
    * self-join — the same discipline as [[NgramDfCap]] on posting lists —
    * bounding the join at buckets·cap² regardless of corpus skew. What a
    * capped-out bucket would have found is not lost: a bucket only
    * exceeds the cap when > cap docs share a band fingerprint, i.e. mass
    * duplication, which the exact-dedup path ([[exactSummary]], md5 over
    * full normalized text) and the remaining un-capped bands still catch.
    * The cap is mirrored in the DuckDB oracle CTEs (window count over the
    * band key), so Spark and oracle prune identical buckets by
    * construction at every scale. At the test SFs (and the 10x
    * re-attestation corpus, max bucket ~20) no bucket reaches the cap,
    * so results are unchanged — this is a worst-case bound, not a tuning.
    */
  val BandBucketCap = 64

  /** Absolute row bound for [[maybeBroadcast]]'s guarded broadcast hint.
    * The candidate-doc and cluster-label frames the hint applies to are
    * bounded per BUCKET by [[BandBucketCap]]/[[NgramDfCap]], but the bucket
    * COUNT grows with the corpus — so in absolute terms these sets are
    * O(corpus), and at some scale a FORCED broadcast would blow past
    * Spark's broadcast limits (8 GB / driver memory) where a shuffle join
    * degrades gracefully. 4M rows of narrow key/label tuples is ~64-128 MB
    * on the build side — comfortably broadcastable, and 3-4 orders of
    * magnitude above what the tested corpora mine — so below the bound the
    * broadcast is strictly better and above it the plain join takes over.
    */
  val BroadcastMaxRows = 4000000L

  /** Broadcast-hint a MATERIALIZED (localCheckpointed) frame iff its actual
    * row count is under [[BroadcastMaxRows]] — the count is a cached-block
    * scan (no recompute), and only the count crosses to the driver
    * (iteration control, never data). Above the bound the frame returns
    * un-hinted and the consuming join degrades to a shuffle join instead of
    * failing at the broadcast ceiling.
    */
  private[graft] def maybeBroadcast(df: DataFrame): DataFrame =
    if (df.count() <= BroadcastMaxRows) broadcast(df) else df

  /** Modulus for the double-hashing family: the smallest prime above
    * 2^32. The mod is NOT optional: without it i*h2 dominates h1 for
    * i >= 2, so every function's argmin collapses onto argmin(h2) — the
    * signatures correlate, every band collides, and the verify join goes
    * quadratic (measured 7 s vs 2.5 s at sf0.1). The wraparound is what
    * makes the k functions behave independently. Declared with the
    * other constants BEFORE the first GraftQuery val: DedupOracle's
    * minhashLshSql interpolates it re-entrantly during this object's
    * initialization (see [[ClusterJaccard]]'s note).
    */
  val MinhashMod = 4294967311L

  /** Jaccard threshold above which a pair is a duplicate EDGE for cluster
    * assignment. High-J near-dup pairs separate cleanly from incidental
    * rare-shingle co-occurrence (J < 0.3 background), so any threshold in
    * (0.3, 0.8) yields the same components. MUST be declared before the
    * first GraftQuery val: constructing one forces [[DedupOracle]]'s
    * initialization, whose clustersSql interpolates this constant — a
    * later declaration would read the uninitialized 0.0.
    */
  val ClusterJaccard = 0.5

  /** Max Hamming distance for a SimHash near-dup pair: same similarity
    * fraction as the old 10-of-32 threshold, rescaled to 60 bits.
    */
  val SimhashHammingMax = 18

  /** Max Hamming distance for a SimHash CLUSTER EDGE ([[clustersMulti]]) —
    * far stricter than [[SimhashHammingMax]], for two reasons. (1) The
    * ${SimhashBands}x${SimhashBandBits}-bit banding guarantees recall only
    * to Hamming 3 (pigeonhole); beyond that a candidate surfacing at all
    * is band-collision luck, so admitting it as evidence is sampling noise.
    * (2) Connected components is TRANSITIVE: a loose pairwise screen that
    * is harmless in a ranked top-k stitches the corpus into one giant
    * component (measured at sf0.1: Hamming<=18 admits 260k edges and
    * collapses 5k docs to 3 components; <=3 admits 512 edges — the
    * actual near-dup band). Edge-grade evidence must be precision-grade.
    */
  val ClusterHamming = 3

  /** Distinct word-n-gram shingles per doc: (doc_id, sh). Takes any
    * (doc_id, text) frame so fixture corpora can drive the pipeline in
    * tests.
    */
  def shingleSet(docs: DataFrame, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      explode(array_distinct(shingles(tokens(col("text")), n))).as("sh"))
  }

  /** One corpus scan + tokenize, materialized: (doc_id, toks). The shared
    * input for [[clustersMulti]]'s three miners — 3-gram shingles, 2-gram
    * shingles, and per-token SimHash votes are all derived from the SAME
    * token arrays, so tokenization (the regex split over every byte of
    * text — the only work proportional to RAW corpus size rather than
    * token count) runs once instead of once per evidence class, and the
    * parquet scan behind it runs once too. Standalone single-miner
    * queries skip this cut: for them the checkpoint write would cost more
    * than the one tokenize pass it saves.
    */
  private[graft] def tokenizedDocs(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), tokens(col("text")).as("toks")).localCheckpoint()
  }

  /** Exact dedup summary: fingerprint = md5(normalized text); the kept set
    * is one doc per fingerprint. (The corpus has no exact dups — the zero
    * is the assertion.) At scale this is one partial-aggregated groupBy on
    * a 16-byte key.
    */
  val exactSummary: GraftQuery = GraftQuery.oneRow(
    "dedup_exact_summary",
    "exact dedup by md5(normalized text): total vs distinct vs dropped",
    DedupOracle.exactSummarySql) { (s, d) =>
    Tables.documents(s, d)
      .select(fingerprint(col("text")).as("fp"))
      .agg(
        count(lit(1)).as("total_docs"),
        countDistinct(col("fp")).as("distinct_docs"),
        (count(lit(1)) - countDistinct(col("fp"))).as("exact_dups"))
  }

  /** Exact n-gram Jaccard, top-20 most-similar pairs. Pairs are generated
    * ONLY where a shingle matches (inverted-index self-join), then
    * |A∩B| / (|A|+|B|-|A∩B|) on distinct-shingle counts. Deterministic
    * order: (jaccard DESC, doc_a, doc_b).
    */
  val ngramTopk: GraftQuery = GraftQuery(
    "dedup_ngram_topk",
    s"word-$ShingleN-gram Jaccard near-dup: top-20 pairs via shingle inverted index",
    DedupOracle.ngramTopkSql) { (s, d) =>
    ngramTopkOf(sharedNgramPairs(s, d))
  }

  /** The n-gram Jaccard pair pipeline over any (doc_id, text) frame:
    * EVERY co-shingled pair with its exact Jaccard, unordered/unlimited —
    * `ngramTopkFrame` sorts/limits it for presentation and
    * [[clusters]] thresholds it into dup edges. Jaccard is over DF-capped
    * shingle sets (see [[NgramDfCap]]): one window count over `sh` drops
    * the corpus-hot shingles, and the surviving posting table is
    * MATERIALIZED (localCheckpoint) before fan-out — it feeds the per-doc
    * sizes AND both sides of the self-join, and without materialization
    * the tokenize+shingle explode would run 3-4x. This is the
    * inverted-index build step: at cluster scale the same table is what a
    * production pipeline persists (or writes bucketed by `sh`) before
    * pair mining.
    */
  def ngramJaccardFrame(docs: DataFrame): DataFrame =
    jaccardPairs(cappedPostings(docs, ShingleN), lit(true))

  /** Shared mined pair table — the [[graft.sim.SimQueries]] shared-model
    * discipline applied to the near-dup graph: ten registry queries
    * (clusters, pagerank, communities, triangles, k-core, funnel, keep-*,
    * source matrix, degree histogram) consume the SAME full-corpus
    * [[ngramJaccardFrame]] mine; the first per (session, sfDir) runs it
    * and persists (doc_a, doc_b, jaccard) through the warehouse, the rest
    * read the table. This is also the production shape the
    * [[ngramJaccardFrame]] scaladoc already names: the inverted-index
    * pair mine is what a pipeline PERSISTS before graph analytics, not
    * something each downstream job re-runs. Determinism makes the reuse
    * oracle-invisible (each DuckDB twin still replays the mine; jaccard
    * doubles roundtrip parquet exactly). Fixture-drivable callers keep
    * passing their own frames to [[ngramJaccardFrame]].
    */
  val NgramPairsTable = "ngram_pairs_full"
  private val pairsDone = graft.api.SharedModels.track(
    new java.util.concurrent.ConcurrentHashMap[
      graft.api.SharedModels.Key, java.lang.Boolean])

  private[graft] def sharedNgramPairs(s: SparkSession, d: String): DataFrame = {
    pairsDone.computeIfAbsent(graft.api.SharedModels.key(s, d), _ => {
      graft.sources.Warehouse.replaceTable(
        ngramJaccardFrame(Tables.documents(s, d)),
        graft.api.SharedModels.tableFor(NgramPairsTable, d))
      java.lang.Boolean.TRUE
    })
    s.table(s"${graft.sources.Warehouse.Schema}." +
      graft.api.SharedModels.tableFor(NgramPairsTable, d))
  }

  /** The DF-capped posting table (doc_id[, extra...], sh), checkpointed.
    * `extra` columns are evaluated over `docs` (so they may reference
    * `text`) and ride along on every posting row — the decontamination
    * screen tags each posting with its document's split this way, which is
    * what lets it filter the PAIR space at the join instead of after it.
    * The DF window always counts over the FULL corpus (extra columns play
    * no part in the cap), so tagged and untagged postings induce identical
    * capped shingle sets. Scratch blocks are freed by the caller's
    * [[graft.api.Checkpoints.releaseAll]] once the consuming aggregate
    * materializes.
    */
  private[graft] def cappedPostings(docs: DataFrame, n: Int, extra: Column*): DataFrame = {
    // Evaluate `extra` in a SEPARATE select BELOW the explode. Putting them
    // in the same select as the generator looks equivalent but is not:
    // ExtractGenerator keeps non-generator expressions in the Project ABOVE
    // the Generate, re-evaluating a per-DOCUMENT expression once per
    // POSTING row — measured 2x on the split-tagged build (the tag is an
    // md5 over the normalized text, and each doc explodes to ~300 rows).
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val pre = docs.select(col("doc_id") +: col("text") +: extra: _*)
    val keep = pre.columns.filterNot(_ == "text").map(col)
    capPostings(pre.select(keep :+
      explode(array_distinct(shingles(tokens(col("text")), n))).as("sh"): _*))
  }

  /** [[cappedPostings]] from a pre-tokenized (doc_id, toks) frame — the
    * shared-scan path for [[clustersMulti]].
    */
  private[graft] def cappedPostingsFromToks(tokDocs: DataFrame, n: Int): DataFrame =
    capPostings(tokDocs.select(col("doc_id"),
      explode(array_distinct(shingles(col("toks"), n))).as("sh")))

  /** The DF cap + checkpoint over a raw posting frame (see
    * [[NgramDfCap]] for why the cap precedes any self-join).
    */
  private def capPostings(postings: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    postings
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("df") <= NgramDfCap)
      .drop("df")
      .localCheckpoint()
  }

  /** Inverted-index pair mining over a posting table: the self-join on `sh`
    * (aliased `x`/`y`; `pairPred` may reference both sides to prune the
    * candidate space AT the join), intersection counts, and exact Jaccard
    * from the per-doc posting sizes. `carry` columns (expression over the
    * aliased join, output name) are functionally dependent on the pair and
    * ride through the groupBy into the output.
    */
  private[graft] def jaccardPairs(sh: DataFrame, pairPred: Column,
      carry: Seq[(Column, String)] = Nil): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val groupCols = Seq(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")) ++
      carry.map { case (c, nm) => c.as(nm) }
    val inter = sh.as("x")
      .join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id")
          && pairPred)
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(Seq(col("doc_a"), col("doc_b"),
        (col("i") / (col("sa.n") + col("sb.n") - col("i"))).as("jaccard")) ++
        carry.map { case (_, nm) => col(nm) }: _*)
  }

  /** Top-20 presentation slice over any (doc_a, doc_b, jaccard) frame —
    * ONE definition of the cut/tie-break, shared by the registry query
    * (persisted-table input) and the fixture path.
    */
  def ngramTopkOf(pairs: DataFrame): DataFrame =
    pairs.orderBy(desc("jaccard"), col("doc_a"), col("doc_b")).limit(20)

  /** Top-20 presentation slice of [[ngramJaccardFrame]]. */
  def ngramTopkFrame(docs: DataFrame): DataFrame =
    ngramTopkOf(ngramJaccardFrame(docs))

  /** One 32-bit half of the shingle's md5 as a long — the basis of the
    * double-hashing signature family h_i(x) = h1(x) + i*h2(x) (h1 = hex
    * chars 1-8, h2 = chars 9-16). `start` is the 1-based hex offset.
    */
  private[graft] def mdHalf(c: Column, start: Int): Column =
    conv(substring(md5(c), start, 8), 16, 10).cast("long")

  /** The i-th MinHash function over a shingle column:
    * (h1 + i*h2) mod [[MinhashMod]]. Max intermediate 12*2^32 < 2^36 —
    * exact BIGINT arithmetic on both engines, no overflow.
    */
  private[graft] def minhashFn(c: Column, i: Int): Column =
    (mdHalf(c, 1) + lit(i.toLong) * mdHalf(c, 9)) % lit(MinhashMod)

  /** MinHash signature columns s0..s(k-1) PLUS the distinct-shingle count,
    * fused into one aggregation pass over the exploded shingle set (the
    * Jaccard verify needs |A| anyway — computing it here saves a full
    * shingle-set recompute + shuffle). The k functions are DOUBLE HASHING
    * (h_i = h1 + i*h2 from ONE md5 split into two 32-bit halves — the
    * standard Kirsch-Mitzenmacher construction): one digest + k integer
    * ops per shingle instead of k digests, which at corpus scale is the
    * difference between hashing dominating the signature pass and the
    * shingle explode dominating it (sig agg 2.6 -> 1.7 s at sf0.1, i.e.
    * the md5 cost vanished into the scan). min(long) inside a hash
    * aggregate is whole-stage-codegen'd with the md5 subexpression
    * eliminated across all k aggregates, AND the exchange materializes
    * the signatures, so downstream consumers never recompute them
    * (see [[rowMinhashSigs]] for the per-row streaming twin).
    */
  private[graft] def minhashSigs(sh: DataFrame): DataFrame = {
    val sigs = (0 until MinhashK).map { i =>
      min(minhashFn(col("sh"), i)).as(s"s$i")
    } :+ count(lit(1)).as("n")
    sh.groupBy(col("doc_id")).agg(sigs.head, sigs.tail: _*)
  }

  /** The same signatures as PER-ROW array expressions — no explode, no
    * aggregation, no shuffle — for the STREAMING ingest path
    * ([[graft.streaming.DocStreams]]), where a groupBy would demand
    * watermarked state the per-document screen doesn't need. Identical
    * values to [[minhashSigs]] (min over the same md5 set); only the
    * execution shape differs, and at ingest rates the interpreted
    * higher-order functions are irrelevant — they cost per ARRIVING doc,
    * not per corpus scan.
    */
  private[graft] def rowMinhashSigs(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sh = array_distinct(shingles(tokens(col("text")), MinhashShingleN))
    val sigs = (0 until MinhashK).map { i =>
      array_min(transform(sh, s => minhashFn(s, i))).as(s"s$i")
    } :+ size(sh).as("n")
    docs.select(col("doc_id") +: sigs: _*)
  }

  /** LSH band keys (doc_id, b, bk) from a signature frame: band b's key is
    * md5 of its [[BandRows]] ':'-joined signature values (the separator
    * keeps variable-length integer renderings unambiguous). One row per
    * doc per band; equality on (b, bk) is the candidate-generation join.
    */
  private[graft] def bandKeys(sigs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val bandStructs = (0 until MinhashK / BandRows).map { b =>
      val key = md5(concat_ws(":",
        (0 until BandRows).map(r => col(s"s${b * BandRows + r}")): _*))
      struct(lit(b).as("b"), key.as("bk"))
    }
    val keepCols = keep.map(col)
    sigs
      .select(col("doc_id") +: keepCols :+
        explode(array(bandStructs: _*)).as("band"): _*)
      .select(col("doc_id") +: keepCols :+
        col("band.b").as("b") :+ col("band.bk").as("bk"): _*)
  }

  /** MinHash + LSH banding near-dup: k=12 signatures over 2-gram shingles,
    * MinhashK/BandRows bands of BandRows rows (4 x 3 as tuned); candidate
    * pairs share a band hash and are verified with exact Jaccard. The band
    * join is the scale path: each doc emits one key per band, and only
    * colliding keys meet in the shuffle.
    */
  val minhashLsh: GraftQuery = GraftQuery(
    "dedup_minhash_lsh",
    s"MinHash($MinhashK)+LSH(${MinhashK / BandRows} bands) over $MinhashShingleN-gram shingles, exact-Jaccard verified top-20",
    DedupOracle.minhashLshSql) { (s, d) =>
    minhashLshFrame(Tables.documents(s, d))
  }

  /** The MinHash+LSH pipeline over any (doc_id, text) frame. The exploded
    * shingle set is MATERIALIZED (localCheckpoint) exactly like the ngram
    * posting table: it feeds the signature aggregate AND both sides of the
    * Jaccard verify join, and without materialization the tokenize+shingle
    * explode re-runs 3x (measured ~7.7s vs ~4.5s at sf0.1). Scratch blocks
    * are freed by the caller's releaseAll once the top-k materializes.
    */
  def minhashLshFrame(docs: DataFrame): DataFrame =
    minhashJaccardFrame(docs)
      .orderBy(desc("jaccard"), col("doc_a"), col("doc_b"))
      .limit(20)

  /** EVERY LSH-candidate pair with its exact Jaccard, unordered/unlimited —
    * [[minhashLshFrame]] slices it for presentation and [[clustersMulti]]
    * thresholds it into dup edges.
    */
  /** Drop LSH band buckets larger than [[BandBucketCap]] BEFORE a band
    * self-join: window count over the band key, filter, drop. The window's
    * hash partitioning on (b, bk) is exactly the downstream join's
    * distribution, so the cap costs no extra exchange — the count rides
    * the shuffle the join needed anyway.
    */
  private[graft] def capBuckets(bands: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bands
      .withColumn("bc", count(lit(1)).over(Window.partitionBy(col("b"), col("bk"))))
      .filter(col("bc") <= BandBucketCap)
      .drop("bc")
  }

  def minhashJaccardFrame(docs: DataFrame): DataFrame =
    minhashJaccardFromShingles(
      shingleSet(docs, MinhashShingleN).localCheckpoint())

  /** [[minhashJaccardFrame]] from a pre-tokenized (doc_id, toks) frame —
    * the shared-scan path for [[clustersMulti]]. No shingle checkpoint
    * here, unlike the raw-text path: with the candidate-pruned verify the
    * shingle frame has exactly two consumers (the signature aggregate and
    * the semi-join prune), both map-side over the already-checkpointed
    * token frame, so re-running the explode is cheaper than a
    * materialization barrier.
    */
  private[graft] def minhashJaccardFromToks(tokDocs: DataFrame): DataFrame =
    minhashJaccardFromShingles(
      tokDocs.select(col("doc_id"),
        explode(array_distinct(shingles(col("toks"), MinhashShingleN))).as("sh")))

  /** `sigsIn`: a precomputed (ideally materialized) [[minhashSigs]] frame
    * over the SAME shingle frame, for callers that need the signatures
    * themselves ([[lshRecallDedup]] compares components s0..s11) — passing
    * it in deduplicates the signature aggregation pass.
    */
  private def minhashJaccardFromShingles(sh: DataFrame,
      sigsIn: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sigs = sigsIn.getOrElse(minhashSigs(sh))
    // One row per (doc, band) with its bucket size riding along — the
    // window's (b, bk) hash partitioning is the band self-join's
    // distribution anyway (see [[capBuckets]]). Materialized because it
    // fans out three ways: both self-join sides AND the candidate-doc
    // prune below. It is the SMALL frame to checkpoint — one row per doc
    // per band — where the old plan checkpointed nothing and re-derived
    // the band frame from the signature aggregate per consumer.
    val bands = bandKeys(sigs)
      .withColumn("bc", count(lit(1)).over(Window.partitionBy(col("b"), col("bk"))))
      .filter(col("bc") <= BandBucketCap)
      .localCheckpoint()
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // The LSH contract keeps the candidate pair set small per bucket
    // (bucket-capped bands admit Σ per-bucket pairs, not O(n²)), so the
    // exact-Jaccard verify only ever needs the shingle rows of docs that
    // appear in some candidate pair. Prune BOTH verify sides with a
    // semi-join on that doc set BEFORE the pair join — without it, the
    // full corpus shingle frame (3 orders of magnitude larger) rides both
    // sides of the (doc, sh) shuffle to feed a few-hundred-doc
    // intersection. A doc is in some candidate pair iff one of its band
    // buckets holds >= 2 docs — the bucket count the cap window already
    // computed — so the prune set needs no pair mining at all. The doc set
    // is per-bucket-bounded but O(corpus) in absolute terms (bucket count
    // grows with the corpus), so the broadcast hint is size-GUARDED, not
    // forced — see [[maybeBroadcast]].
    // candDocs stays LAZY: when the guard admits the broadcast, the
    // distinct computes inside the broadcast exchange — a checkpoint here
    // (an extra eager job + count) measured as pure overhead (same-window
    // A/B, round 10: 3.19 -> 2.90 s on dedup_clusters_multi after
    // removing it). The guard instead reads the materialized `bands`
    // count, a strict upper bound on candDocs rows (one band row per doc
    // per band), so no new job materializes anything. (The same A/B pass
    // also rejected checkpointing the pruned `shc` frame below: it feeds
    // both intersect sides on different keys, but the materialization
    // barrier cost MORE than the saved re-explode — 15-25% regressions on
    // all three minhash-verify consumers.)
    val candDocs = bands.filter(col("bc") > 1)
      .select(col("doc_id")).distinct()
    val shc = sh.join(
      if (bands.count() <= BroadcastMaxRows) broadcast(candDocs) else candDocs,
      Seq("doc_id"), "semi")
    val sizes = sigs.select(col("doc_id"), col("n"))
    val inter = cand
      .join(shc.as("xa"), col("doc_a") === col("xa.doc_id"))
      .join(shc.as("xb"), col("doc_b") === col("xb.doc_id") && col("xa.sh") === col("xb.sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("i") / (col("sa.n") + col("sb.n") - col("i"))).as("jaccard"))
  }

  /** Content-hash bucket (of 100) at or above which a document belongs to
    * the INCOMING batch for [[incrementalScreen]] — the same 90/100 line
    * as doc_splits' test split, so the batch is a deterministic,
    * re-shard-stable 10% sample whatever the corpus partitioning.
    */
  val IncrementalIncomingBucket = 90

  /** ID-split for [[bloomScreen]]'s incoming batch: docs with
    * doc_id % [[BloomBatchModulus]] == [[BloomBatchResidue]] are "the
    * incoming batch" (an ID split on purpose — a content-hash split would
    * put byte-identical docs on the same side by construction). Shared by
    * query and oracle so the screen re-runs at any batch fraction by
    * editing one place. DECLARED BEFORE the GraftQuery vals that
    * interpolate it: the oracle SQL is built eagerly at object init, and
    * a later-positioned val would read as 0 mid-initialization (this
    * exact bug shipped once — duck side became `doc_id % 0`).
    */
  val BloomBatchModulus = 10
  val BloomBatchResidue = 9

  /** Incremental ingest dedup — the ASYMMETRIC production shape every
    * self-join miner above deliberately avoids needing: when a new batch
    * arrives into an already-deduped 100 TB corpus, you do not re-mine
    * the corpus; you probe the batch against the corpus's standing
    * MinHash band index. Index side = existing docs' band keys,
    * bucket-capped exactly like the self-join miners (an over-cap index
    * bucket is mass duplication — the exact-dedup path's job); probe side
    * = incoming docs' band keys, NOT capped (each incoming doc probes at
    * most one bucket per band). Candidates are (incoming, existing) pairs
    * sharing a band key, verified with exact Jaccard over
    * candidate-pruned shingle sets, and each flagged incoming doc reports
    * its best match (max Jaccard, ties to the smallest existing doc_id).
    * At scale the index is a persisted bucketed table and the probe
    * shuffle is proportional to the BATCH, not the corpus — here both
    * sides derive from one corpus scan tagged by the content-hash split.
    */
  val incrementalScreen: GraftQuery = GraftQuery(
    "dedup_incremental_screen",
    "incremental ingest dedup: incoming 10% batch probed against the existing-corpus MinHash band index, exact-Jaccard verified best match",
    DedupOracle.incrementalScreenSql) { (s, d) =>
    incrementalScreenFrame(Tables.documents(s, d))
  }

  /** The incremental-screen pipeline over any (doc_id, text) frame so
    * fixture corpora can drive it in tests — see [[incrementalScreen]]
    * for the semantics.
    */
  private[graft] def incrementalScreenFrame(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = docs.select(col("doc_id"),
      (hash60(normText(col("text"))) % 100 >= IncrementalIncomingBucket)
        .as("incoming"),
      tokens(col("text")).as("toks"))
    // ONE corpus scan: shingles tagged with batch membership, materialized
    // for the signature aggregate AND the verify side
    val sh = base.select(col("doc_id"), col("incoming"),
      explode(array_distinct(shingles(col("toks"), MinhashShingleN))).as("sh"))
      .localCheckpoint()
    val sigCols = (0 until MinhashK).map { i =>
      min(minhashFn(col("sh"), i)).as(s"s$i")
    } :+ count(lit(1)).as("n")
    // one row per doc; feeds the band frames (twice, map-side) and the
    // per-doc sizes — materialize once
    val sigs = sh.groupBy(col("doc_id"), col("incoming"))
      .agg(sigCols.head, sigCols.tail: _*)
      .localCheckpoint()
    val bands = bandKeys(sigs, keep = Seq("incoming"))
    val exBands = capBuckets(
      bands.filter(!col("incoming")).select("doc_id", "b", "bk"))
    val incBands = bands.filter(col("incoming"))
      .select(col("doc_id").as("inc_doc"), col("b"), col("bk"))
    val cand = incBands.join(exBands, Seq("b", "bk"))
      .select(col("inc_doc"), col("doc_id").as("ex_doc"))
      .distinct()
      .localCheckpoint()
    // size-guarded broadcast (candidates are O(batch x bands) here, but
    // the same absolute-bound discipline as the symmetric miner applies):
    // candDocs rows <= 2x the materialized `cand` pair count, so the guard
    // rides a cached-block count and candDocs stays lazy inside the
    // broadcast exchange
    val candDocs = cand
      .select(explode(array(col("inc_doc"), col("ex_doc"))).as("doc_id"))
      .distinct()
    val shc = sh.join(
      if (cand.count() * 2 <= BroadcastMaxRows) broadcast(candDocs) else candDocs,
      Seq("doc_id"), "semi")
    val sizes = sigs.select(col("doc_id"), col("n"))
    val inter = cand
      .join(shc.as("xa"), col("inc_doc") === col("xa.doc_id"))
      .join(shc.as("xb"),
        col("ex_doc") === col("xb.doc_id") && col("xa.sh") === col("xb.sh"))
      .groupBy(col("inc_doc"), col("ex_doc"))
      .agg(count(lit(1)).as("i"))
    val verified = inter
      .join(sizes.as("sa"), col("inc_doc") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("ex_doc") === col("sb.doc_id"))
      .select(col("inc_doc"), col("ex_doc"),
        (col("i") / (col("sa.n") + col("sb.n") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= ClusterJaccard)
    val w = Window.partitionBy(col("inc_doc"))
      .orderBy(desc("jaccard"), col("ex_doc"))
    verified
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("inc_doc").as("doc_id"), col("ex_doc").as("match_doc"),
        col("jaccard"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup: candidates share one of [[SimhashBands]] disjoint
    * [[SimhashBandBits]]-bit bands of the 60-bit fingerprint (banding for
    * Hamming space), verified by bit_count(xor) <= [[SimhashHammingMax]].
    * Top-20 by (distance, doc_a, doc_b).
    */
  val simhashPairs: GraftQuery = GraftQuery(
    "dedup_simhash_pairs",
    s"SimHash near-dup: ${SimhashBands}x$SimhashBandBits-bit band candidates, " +
      s"Hamming <= $SimhashHammingMax, top-20",
    DedupOracle.simhashPairsSql) { (s, d) =>
    simhashPairFrame(s, d)
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** EVERY SimHash band-candidate pair within Hamming <=
    * [[SimhashHammingMax]], unordered/unlimited — [[simhashPairs]] slices
    * it for presentation and [[clustersMulti]] uses it as an edge class.
    */
  def simhashPairFrame(s: SparkSession, d: String): DataFrame =
    // the fingerprint frame is one row per doc but costs the full
    // explode + two-exchange aggregation — materialize it ONCE before it
    // fans out to both sides of the band self-join (same discipline as
    // cappedPostings; the caller's releaseAll frees the blocks)
    simhashPairsFromFp(
      graft.text.TextQueries.simhashFrame(s, d).localCheckpoint())

  private[graft] def simhashPairsFromFp(fp: DataFrame): DataFrame = {
    val bandMask = (1L << SimhashBandBits) - 1
    val bandStructs = (0 until SimhashBands).map { b =>
      struct(lit(b).as("b"),
        shiftright(col("simhash"), b * SimhashBandBits)
          .bitwiseAND(lit(bandMask)).as("bk"))
    }
    val bands = capBuckets(fp.select(col("doc_id"), col("simhash"),
      explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("simhash"), col("band.b").as("b"), col("band.bk").as("bk")))
    bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= SimhashHammingMax)
  }

  /** Sweep cap for [[connectedComponents]]. With the pointer-jump step
    * each sweep DOUBLES the distance a label travels, so sweeps =
    * O(log2(max component diameter)) — the cap supports diameter ~2^12,
    * far past anything a near-dup graph produces (and measured: the
    * cross-family edge union at sf0.1 has a diameter-20+ chain component
    * that converges in 5 sweeps). An input that still exhausts the cap
    * fails FAST with a diagnosis instead of grinding out shuffles.
    */
  val MaxCcSweeps = 12

  /** Single-task bound for [[connectedComponents]]'s union-find fast path:
    * edge lists at or under this size are solved in ONE task; larger ones
    * take the log-round distributed sweeps. Worst-case single-task state
    * is flat primitive arrays — ≤4M symmetric rows means ≤4M distinct
    * nodes, held in an open-addressed long->long table of at most 8M
    * slots = 128 MB, an order of magnitude under executor memory. The mined near-dup edge set is orders of magnitude smaller
    * than the corpus BY CONSTRUCTION — every candidate generator is
    * banded/DF-capped, so |edges| is bounded by Σ per-bucket pairs, not
    * O(n²) — which is why the fast path covers all but adversarial
    * corpora even at 100 TB; when it doesn't, the sweeps take over with
    * no user-visible difference.
    */
  val LocalCcMaxEdges = 4000000L

  /** Connected components over an (a, b) edge list, size-adaptive:
    *
    *   - `|edges| <= LocalCcMaxEdges`: union-find (path compression +
    *     union-by-min) in a single task. An iterative pointer-chasing
    *     algorithm over a frame this small is exactly the case where
    *     per-round scheduling overhead dwarfs compute — one pass beats
    *     any number of distributed sweeps (measured 5.7 s -> 0.3 s on the
    *     cross-family union at sf0.1).
    *   - larger: minimum-label propagation with pointer jumping. Each
    *     sweep takes (1) the min label across direct neighbors, then (2)
    *     the label OF that label (a self-join of the propagated frame),
    *     giving O(log diameter) rounds on chain components (the
    *     pointer-doubling half of the classic MapReduce CC family) and
    *     BFS-distance rounds on expander components. Each sweep is one
    *     checkpointed job; the convergence check scans the materialized
    *     blocks (the frame carries the pre-sweep label) — no extra join
    *     job. Superseded sweeps unpersist immediately, so peak block
    *     storage is TWO sweeps regardless of iteration count. The driver
    *     only ever sees edge/changed COUNTS — iteration control, never
    *     data. Bounded by [[MaxCcSweeps]].
    *
    * Both paths converge to the same fixpoint — label = min doc_id of the
    * component — so consumers (and the DuckDB oracles' recursive
    * reachability closure) are path-agnostic. `maxLocalEdges`/`maxSweeps`
    * exist for tests to force and bound the distributed path; production
    * callers use the defaults.
    */
  def connectedComponents(edges: DataFrame,
      maxLocalEdges: Long = LocalCcMaxEdges,
      maxSweeps: Int = MaxCcSweeps): DataFrame = {
    // Materialize the RAW edge list once — a localCheckpoint here is
    // shuffle-free (partitions persist as-is), and every path needs the
    // mined edges at least twice (count gate + consumer), so callers
    // don't have to pre-checkpoint their mining pipelines. When the
    // caller ALREADY materialized (clustersMulti checkpoints the edge
    // union for its rollup), a second checkpoint is a redundant block
    // copy + barrier job — detected structurally (narrow ops over a
    // LogicalRDD leaf re-scan cached blocks per consumer for free).
    val pre = edges.select(col("a"), col("b"))
    def narrowOverRdd(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
          narrowOverRdd(pr.child)
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          narrowOverRdd(f.child)
        case _: org.apache.spark.sql.execution.LogicalRDD => true
        case _ => false
      }
    // ownership matters: blocks this function materialized are released
    // when superseded; a caller-owned checkpoint must survive (the caller
    // still consumes it — clustersMulti's evidence rollup re-reads the
    // edge blocks after CC returns)
    val ownFwd = !narrowOverRdd(pre.queryExecution.analyzed)
    val fwd = if (ownFwd) pre.localCheckpoint() else pre
    // Fast-path gate on the raw edge count: union-find is direction-
    // agnostic (union(a,b) == union(b,a)) and duplicate-tolerant, so the
    // symmetrize + distinct the sweep path needs is pure overhead here —
    // one barrier job and a full shuffle of the edge frame, measured
    // ~0.4 s of the cross-family cluster query at sf0.1. Raw count <=
    // maxLocalEdges/2 implies symmetric rows <= maxLocalEdges, so the
    // documented single-task memory bound is unchanged.
    if (fwd.count() <= maxLocalEdges / 2)
      return localUnionFind(fwd, releaseInput = ownFwd)
    val sym = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    if (ownFwd) graft.api.Checkpoints.release(fwd)
    if (sym.count() <= maxLocalEdges) return localUnionFind(sym)
    // seed = min(self, direct neighbors): the first propagation sweep
    // fused into initialization (one aggregation over sym), so pair
    // components are final before the loop even runs
    var labels = sym.groupBy(col("a"))
      .agg(min(col("b")).as("nb"))
      .select(col("a").as("node"), least(col("a"), col("nb")).as("label"))
      .localCheckpoint()
    var changed = 1L
    var sweeps = 0
    while (changed > 0) {
      sweeps += 1
      require(sweeps <= maxSweeps,
        s"connectedComponents: no convergence after $maxSweeps sweeps — " +
          "component diameter exceeds 2^" + maxSweeps + " or the edge set " +
          "is pathological; inspect dedup_degree_histogram for a hub")
      // (1) propagate: min label across self + direct neighbors
      val nbrMin = sym
        .join(labels.select(col("node").as("nbr"), col("label").as("nl")),
          col("b") === col("nbr"))
        .groupBy(col("a").as("node"))
        .agg(min(col("nl")).as("nl"))
      val prop = labels
        .join(nbrMin.select(col("node").as("node2"), col("nl")),
          col("node") === col("node2"), "left")
        .select(col("node"), col("label").as("prev"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      // (2) pointer jump: label := label(label). Every label IS a node id
      // present in `prop` (labels only ever take node-id values), so the
      // left join misses nothing; `prop` is evaluated twice inside this
      // one job — two small shuffle subtrees, still cheaper than a
      // second checkpoint barrier per sweep. (One jump only: measured on
      // the cross-family edge union, a second jump leaves the sweep count
      // UNCHANGED — the big components are expander-shaped, so rounds are
      // bounded by BFS distance from the min node, which jumping label
      // chains cannot shortcut — while quadrupling the prop recompute.)
      val next = prop.as("p")
        .join(prop.select(col("node").as("jn"), col("label").as("jl")).as("j"),
          col("p.label") === col("j.jn"), "left")
        .select(col("p.node").as("node"), col("p.prev").as("prev"),
          least(col("p.label"), coalesce(col("jl"), col("p.label"))).as("label"))
        .localCheckpoint()
      changed = next.filter(col("label") < col("prev")).count()
      graft.api.Checkpoints.release(labels)
      labels = next.select(col("node"), col("label"))
    }
    graft.api.Checkpoints.release(sym)
    labels
  }

  /** Union-find over an edge frame in ONE task: path compression +
    * union-by-min (the smaller root wins, so the root IS the component
    * minimum — the same fixpoint as the sweeps, with no argmin pass).
    * The edge list needs neither symmetrization nor dedup — union is
    * commutative and re-unioning an already-joined pair is a no-op — so
    * the fast path feeds the RAW mined edges straight in.
    * `mapPartitions` is legitimate here: union-find is inherently
    * pointer-chasing state no Catalyst expression expresses, and the
    * single-partition coalesce is what the [[LocalCcMaxEdges]] bound
    * licenses. Output is checkpointed so the input's blocks can be
    * released before the caller composes further plans on the labels
    * (the input is always [[connectedComponents]]'s own materialization,
    * never a caller-owned frame).
    */
  private[graft] def localUnionFind(sym: DataFrame,
      releaseInput: Boolean = true): DataFrame = {
    val s = sym.sparkSession
    import s.implicits._
    val labels = sym
      .select(col("a").cast("long"), col("b").cast("long")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        // Primitive open-addressing parent table (16 B/slot, ≤0.75 load)
        // instead of boxed java.util maps (~60 B/entry + GC churn): the
        // single-task footprint stays within the bound documented at
        // [[LocalCcMaxEdges]]. find() inserts unseen nodes as their own
        // root, so the table's key set IS the node set — no side set.
        val parent = new LongLongMap(1 << 20)
        def find(x0: Long): Long = {
          var x = x0
          var p = parent.getOrInsert(x)
          while (p != x) {
            val gp = parent.getOrInsert(p)
            parent.put(x, gp)
            x = gp
            p = parent.getOrInsert(x)
          }
          x
        }
        it.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
        parent.keysIterator.map(n => (n, find(n)))
      }
      .toDF("node", "label")
      .localCheckpoint()
    if (releaseInput) graft.api.Checkpoints.release(sym)
    labels
  }

  /** Open-addressing long->long hash table with linear probing: flat
    * primitive arrays, power-of-two capacity, grow at 3/4 load. Keys are
    * doc ids (any value except the Long.MinValue empty sentinel, which no
    * id generator produces). Exists solely for [[localUnionFind]]'s
    * single-task state, where boxed maps would triple the footprint.
    */
  private[graft] final class LongLongMap(initialCapacity: Int) {
    private val Empty = Long.MinValue
    private var mask = 0
    private var keys: Array[Long] = _
    private var vals: Array[Long] = _
    private var used = 0
    locally {
      var c = 16
      while (c < initialCapacity) c <<= 1
      alloc(c)
    }
    private def alloc(c: Int): Unit = {
      keys = Array.fill(c)(Empty); vals = new Array[Long](c)
      mask = c - 1; used = 0
    }
    private def slot(k: Long): Int = {
      var h = k * -7046029254386353131L // splitmix64 finalizer multiplier
      h ^= h >>> 32
      (h & mask).toInt
    }
    private def grow(): Unit = {
      val ok = keys; val ov = vals
      alloc((mask + 1) << 1)
      var i = 0
      while (i < ok.length) {
        if (ok(i) != Empty) put(ok(i), ov(i))
        i += 1
      }
    }
    def put(k: Long, v: Long): Unit = {
      require(k != Empty, "LongLongMap: sentinel key")
      var i = slot(k)
      while (keys(i) != Empty && keys(i) != k) i = (i + 1) & mask
      if (keys(i) == Empty) {
        keys(i) = k; used += 1
        if (used * 4 > (mask + 1) * 3) { vals(i) = v; grow(); return }
      }
      vals(i) = v
    }
    /** Value for `k`, inserting `k -> k` first if absent. */
    def getOrInsert(k: Long): Long = {
      require(k != Empty, "LongLongMap: sentinel key")
      var i = slot(k)
      while (keys(i) != Empty && keys(i) != k) i = (i + 1) & mask
      if (keys(i) == k) vals(i)
      else { put(k, k); k }
    }
    def keysIterator: Iterator[Long] =
      keys.iterator.filter(_ != Empty)
  }

  /** Near-dup cluster assignment — the step a dedup pipeline runs AFTER
    * pair mining: connected components over the J >= [[ClusterJaccard]]
    * edge set, one row per cluster with its canonical id (min doc_id) and
    * size. `sum(cluster_size) - count(*)` is exactly the number of docs a
    * keep-one-per-cluster pass would drop.
    */
  val clusters: GraftQuery = GraftQuery(
    "dedup_clusters",
    s"near-dup clusters: connected components over ngram-Jaccard >= $ClusterJaccard edges, per-cluster size",
    DedupOracle.clustersSql) { (s, d) =>
    val edges = sharedNgramPairs(s, d)
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    connectedComponents(edges)
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .orderBy(desc("cluster_size"), col("cluster_id"))
  }

  /** INCREMENTAL cluster maintenance — the production gap between
    * [[incrementalScreen]] (which flags batch near-dups but assigns no
    * clusters) and [[clusters]] (which re-runs CC over the whole corpus):
    * merge a new batch into PERSISTED cluster assignments without
    * re-clustering the corpus. The batch is the [[incrementalScreen]]
    * content-hash 10% split; the persisted state is CC over the OLD-OLD
    * edge subset (labels = min old doc_id per component, singletons =
    * self). Maintenance runs CC over the FRONTIER graph only: edges
    * touching a batch doc, with old endpoints CONTRACTED to their
    * persisted cluster label — a graph bounded by the batch-adjacent
    * neighborhood (|batch edges| nodes), never the corpus. Contraction
    * is exact: old-old connectivity is already summarized by the labels,
    * and a batch doc bridging two old clusters connects their LABELS, so
    * merged label = min(label ids, batch doc ids) = the combined
    * component's min doc_id = exactly the full-recompute label.
    *
    * The output is the merge-vs-recompute attestation
    * (`portfolio_incremental_merge`'s contract on the cluster side):
    * per final cluster, size, batch-doc count, how many persisted
    * clusters merged into it, and merge_ok — a GENUINE per-doc equality
    * between the merged assignment and a full CC recompute over the
    * combined edge set, computed on both engines. Disagreeing docs
    * force their cluster row into the output (the `n_docs >= 2 OR NOT
    * merge_ok` filter), so a merge bug cannot hide in the singleton cut.
    *
    * Scale: the full recompute here is the AUDIT side (this corpus is
    * small enough to afford it); production runs only the state CC once,
    * then per-batch frontier CCs — the edge mining is one shared pass
    * split by membership, and the frontier CC's input is bounded by the
    * batch's mined edges.
    */
  val clusterIncrement: GraftQuery = GraftQuery(
    "dedup_cluster_increment",
    s"incremental cluster maintenance: frontier CC over persisted labels + batch edges, per-cluster merge_ok vs full recompute",
    DedupOracle.clusterIncrementSql) { (s, d) =>
    graft.functions.GraftFunctions.register(s)
    clusterIncrementFrame(Tables.documents(s, d),
      hash60(normText(col("text"))) % 100 >= IncrementalIncomingBucket,
      Some(sharedNgramPairs(s, d)))
  }

  /** The incremental-cluster pipeline over any (doc_id, text) frame with
    * an explicit batch-membership predicate, so fixture corpora can
    * drive the contraction paths the live corpus may not exhibit (e.g.
    * a batch doc BRIDGING two persisted clusters) — see
    * [[clusterIncrement]] for semantics.
    */
  private[graft] def clusterIncrementFrame(docs: DataFrame,
      incomingPred: Column, pairsOpt: Option[DataFrame] = None): DataFrame = {
    val memb = docs.select(col("doc_id"), incomingPred.as("incoming"))
      .localCheckpoint(eager = false)
    val edges = pairsOpt.getOrElse(ngramJaccardFrame(docs))
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .join(memb.select(col("doc_id").as("a"), col("incoming").as("ia")), "a")
      .join(memb.select(col("doc_id").as("b"), col("incoming").as("ib")), "b")
      .select(col("a"), col("b"), col("ia"), col("ib"))
      .localCheckpoint()
    // PERSISTED state: CC over old-old edges; unclustered old docs are
    // their own singleton cluster
    val oldLab = connectedComponents(
      edges.filter(!col("ia") && !col("ib")).select("a", "b"))
    val state = memb.filter(!col("incoming"))
      .join(oldLab.select(col("node").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"))
      .localCheckpoint()
    // FRONTIER: batch-touching edges with old endpoints contracted
    val frontier = edges.filter(col("ia") || col("ib"))
      .join(state.select(col("doc_id").as("a"), col("cluster").as("ca")),
        Seq("a"), "left")
      .join(state.select(col("doc_id").as("b"), col("cluster").as("cb")),
        Seq("b"), "left")
      .select(
        when(col("ia"), col("a")).otherwise(col("ca")).as("a"),
        when(col("ib"), col("b")).otherwise(col("cb")).as("b"))
    val fLab = connectedComponents(frontier)
    // MERGED assignments: old docs re-label through their cluster, batch
    // docs label directly; untouched ids keep their label
    val mergedOld = state
      .join(fLab.select(col("node").as("cluster"), col("label").as("fl")),
        Seq("cluster"), "left")
      .select(col("doc_id"),
        coalesce(col("fl"), col("cluster")).as("m"),
        col("cluster").as("src"))
    val mergedNew = memb.filter(col("incoming"))
      .join(fLab.select(col("node").as("doc_id"), col("label").as("fl")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("fl"), col("doc_id")).as("m"),
        lit(null).cast("long").as("src"))
    // FULL recompute (the audit side)
    val fullLab = connectedComponents(edges.select("a", "b"))
    val full = memb
      .join(fullLab.select(col("node").as("doc_id"), col("label").as("f")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("incoming"),
        coalesce(col("f"), col("doc_id")).as("f"))
    mergedOld.unionByName(mergedNew)
      .join(full, "doc_id")
      .groupBy(col("f").as("cluster"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("incoming"), 1)).as("n_new_docs"),
        countDistinct(col("src")).as("n_old_clusters_merged"),
        bool_and(col("m") === col("f")).as("merge_ok"))
      .filter(col("n_docs") >= 2 || !col("merge_ok"))
      .orderBy("cluster")
  }

  /** Cross-family cluster assignment — how a production dedup pipeline
    * actually builds components: the THREE near-dup evidence classes
    * (exact n-gram Jaccard, MinHash+LSH-verified Jaccard, SimHash
    * Hamming) are mined independently, tagged, unioned into one edge set,
    * and connected components run over the union. A pair that any one
    * screen catches joins its endpoints' clusters; the per-class edge
    * counts in the output show WHICH screen stitched each cluster
    * together (a cluster held only by simhash edges is borderline; one
    * confirmed by all three is a sure dup group). Scale shape: each class
    * is the same capped/banded candidate generator as its standalone
    * query — the union adds no new join pattern — and the edge frame is
    * materialized once before fanning out to CC and the evidence rollup.
    * The SimHash class is admitted at [[ClusterHamming]], NOT the top-k
    * query's [[SimhashHammingMax]] — see [[ClusterHamming]] for why a
    * transitive consumer needs a precision-grade threshold.
    */
  val clustersMulti: GraftQuery = GraftQuery(
    "dedup_clusters_multi",
    "cross-family dedup clusters: CC over ngram+minhash+simhash edge union, per-class edge counts",
    DedupOracle.clustersMultiSql) { (s, d) =>
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val docs = Tables.documents(s, d)
    // ONE corpus scan + tokenize feeds all three evidence classes (each
    // derives its own key — 3-gram shingles, 2-gram shingles, per-token
    // hash votes — from the same materialized token arrays), and the
    // three mining pipelines then run from concurrent threads so their
    // jobs overlap instead of serializing (Spark's scheduler runs
    // concurrent jobs side by side; results are deterministic frames, so
    // only wall-clock changes)
    val tok = tokenizedDocs(docs)
    val Seq(jac, mh, sh) = Await.result(Future.sequence(Seq(
      Future(jaccardPairs(cappedPostingsFromToks(tok, ShingleN), lit(true))
        .filter(col("jaccard") >= ClusterJaccard)
        .select(col("doc_a").as("a"), col("doc_b").as("b"),
          lit("jaccard").as("evidence"))),
      Future(minhashJaccardFromToks(tok)
        .filter(col("jaccard") >= ClusterJaccard)
        .select(col("doc_a").as("a"), col("doc_b").as("b"),
          lit("minhash").as("evidence"))),
      Future(simhashPairsFromFp(
        graft.text.TextQueries.simhashFromTokens(tok).localCheckpoint())
        .filter(col("hamming") <= ClusterHamming)
        .select(col("doc_a").as("a"), col("doc_b").as("b"),
          lit("simhash").as("evidence"))))), Duration.Inf)
    // materialize the union: it feeds every CC sweep AND the per-class
    // rollup — without the cut all three mining pipelines re-run per use
    val edges = jac.unionByName(mh).unionByName(sh).localCheckpoint()
    val labels = connectedComponents(edges)
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    // every edge's endpoints share a label at the CC fixpoint, so joining
    // on the LEFT endpoint alone assigns each edge to exactly one cluster.
    // labels is one row per CLUSTERED node — bounded by the mined edge
    // count, which is itself O(corpus) in absolute terms (the caps bound
    // pairs per bucket, not the bucket count) — so the broadcast is
    // size-guarded against [[BroadcastMaxRows]], not forced: labels is
    // already checkpointed by connectedComponents, making the guard count
    // a cached scan
    val ev = edges.join(maybeBroadcast(labels), col("a") === col("node"))
      .groupBy(col("label"))
      .agg(
        sum(when(col("evidence") === "jaccard", 1L).otherwise(0L))
          .as("n_jaccard_edges"),
        sum(when(col("evidence") === "minhash", 1L).otherwise(0L))
          .as("n_minhash_edges"),
        sum(when(col("evidence") === "simhash", 1L).otherwise(0L))
          .as("n_simhash_edges"))
    sizes.join(ev, Seq("label"))
      .select(col("label").as("cluster_id"), col("cluster_size"),
        col("n_jaccard_edges"), col("n_minhash_edges"), col("n_simhash_edges"))
      .orderBy(desc("cluster_size"), col("cluster_id"))
  }

  /** The END-TO-END keep decision — what a dedup pipeline actually writes
    * out: per language, how many documents survive (a) exact dedup (keep
    * the min doc_id of each fingerprint group) and (b) near-dup dedup
    * (keep the min doc_id of each J >= [[ClusterJaccard]] cluster;
    * unclustered docs always survive), and the intersection a sequential
    * exact-then-near-dup pipeline keeps. Exploits the min-label CC
    * invariant: at the fixpoint a node's label IS its cluster's minimum
    * doc_id, so the near-dup keeper test is `label = doc_id` — no extra
    * per-cluster argmin pass. One window over the fingerprint groups +
    * one left join against the (clustered-nodes-only) label frame; the
    * heavy lifting is the same DF-capped pair mining the cluster query
    * runs.
    */
  val keepSummary: GraftQuery = GraftQuery(
    "dedup_keep_summary",
    "end-to-end dedup funnel: per-language exact / near-dup / combined keep counts",
    DedupOracle.keepSummarySql) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val edges = sharedNgramPairs(s, d)
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val labels = connectedComponents(edges)
    val flagged = docs
      .select(col("doc_id"), col("lang"), fingerprint(col("text")).as("fp"))
      .withColumn("keep_exact",
        col("doc_id") === min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .join(labels, col("doc_id") === col("node"), "left")
      .withColumn("keep_nd",
        col("node").isNull || col("label") === col("doc_id"))
    flagged.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs_in"),
        sum(when(col("keep_exact"), 1L).otherwise(0L)).as("exact_kept"),
        sum(when(col("keep_nd"), 1L).otherwise(0L)).as("neardup_kept"),
        sum(when(col("keep_exact") && col("keep_nd"), 1L).otherwise(0L))
          .as("final_kept"))
      .orderBy("lang")
  }

  /** Exact-substring (span) dedup: pairs of documents sharing verbatim
    * [[SpanN]]-token windows, ranked by how many windows they share. The
    * complement of the Jaccard screens: catches copy-paste and quotation
    * overlap that whole-document set similarity dilutes below threshold.
    * Candidates come from the same DF-capped inverted index as the n-gram
    * path (a window shared by > [[NgramDfCap]] docs is boilerplate with no
    * pair-discriminating power), so the pair space stays linear in the
    * corpus; `overlap_frac` = shared / min(spans) is the containment-style
    * score a removal pass would threshold.
    */
  val spanOverlap: GraftQuery = GraftQuery(
    "dedup_span_overlap",
    s"exact-substring dedup: pairs sharing verbatim $SpanN-token windows, top-20 by count",
    DedupOracle.spanOverlapSql) { (s, d) =>
    spanOverlapFrame(Tables.documents(s, d))
  }

  /** The span-overlap pipeline over any (doc_id, text) frame. */
  def spanOverlapFrame(docs: DataFrame): DataFrame = {
    val sp = cappedPostings(docs, SpanN)
    val sizes = sp.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    sp.as("x")
      .join(sp.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_spans"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("shared_spans"),
        (col("shared_spans") / least(col("sa.n"), col("sb.n"))).as("overlap_frac"))
      .orderBy(desc("shared_spans"), col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Chunk width (tokens) for paragraph-granularity dedup. The corpus is
    * single-spaced prose with no paragraph separators, so "paragraphs" are
    * fixed 64-token chunks — the same fixed-window chunking production
    * pipelines fall back to on boilerplate-stripped text.
    */
  val ChunkTokens = 64

  /** Paragraph-granularity near-dup — the evidence class whole-document
    * miners dilute: template flooding and quoted sections live at
    * paragraph level (a 600-token doc sharing one 64-token paragraph has
    * whole-doc J ~0.1, invisible to the J >= [[ClusterJaccard]] screen,
    * but chunk-level J ~1.0 here). Documents split into [[ChunkTokens]]
    * chunks; each chunk runs the SAME DF-capped 3-gram Jaccard mining as
    * the whole-doc path, keyed by (doc, chunk); chunk pairs from DIFFERENT
    * docs at J >= [[ClusterJaccard]] roll up to (doc pair, n_dup_chunks,
    * max_jaccard). Scale shape: identical to the whole-doc inverted index
    * — the DF cap bounds every posting list, chunking only refines the key
    * — and the cross-doc predicate prunes within-doc chunk pairs AT the
    * self-join.
    */
  val paragraphPairs: GraftQuery = GraftQuery(
    "dedup_paragraph_pairs",
    s"paragraph near-dup: $ChunkTokens-token chunks, DF-capped chunk Jaccard >= $ClusterJaccard, dup-chunk counts per doc pair",
    DedupOracle.paragraphPairsSql) { (s, d) =>
    paragraphPairsFrame(Tables.documents(s, d))
  }

  /** The paragraph-pair pipeline over any (doc_id, text) frame. */
  def paragraphPairsFrame(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val chunks = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0),
          floor((size(col("toks")) - 1) / lit(ChunkTokens.toDouble)).cast("int")),
        c => slice(col("toks"), c * lit(ChunkTokens) + lit(1), lit(ChunkTokens)))))
      .select(col("doc_id"), col("pos").as("chunk"), col("col").as("ctoks"))
    // chunk-granularity DF-capped posting table — the cap counts CHUNK
    // postings (the join unit), same discipline as [[capPostings]]
    val sh = chunks.select(col("doc_id"), col("chunk"),
        explode(array_distinct(shingles(col("ctoks"), ShingleN))).as("sh"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("df") <= NgramDfCap)
      .drop("df")
      .localCheckpoint()
    val sizes = sh.groupBy(col("doc_id"), col("chunk")).agg(count(lit(1)).as("n"))
    val inter = sh.as("x")
      .join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("x.chunk").as("chunk_a"),
        col("y.doc_id").as("doc_b"), col("y.chunk").as("chunk_b"))
      .agg(count(lit(1)).as("i"))
    val pairs = inter
      .join(sizes.as("sa"),
        col("doc_a") === col("sa.doc_id") && col("chunk_a") === col("sa.chunk"))
      .join(sizes.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("chunk_b") === col("sb.chunk"))
      .select(col("doc_a"), col("doc_b"),
        (col("i") / (col("sa.n") + col("sb.n") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= ClusterJaccard)
    pairs.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_dup_chunks"), max(col("jaccard")).as("max_jaccard"))
      .orderBy(desc("n_dup_chunks"), col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Exact-substring span REMOVAL — the rewrite half of span dedup
    * ([[spanOverlap]] DETECTS pairs sharing verbatim [[SpanN]]-token
    * windows; this EXCISES them, the C4/Pile-style cleanup step a
    * production LLM pipeline actually writes out). Every window occurrence
    * whose value is shared by 2..[[NgramDfCap]] documents has a canonical
    * owner — the minimum doc_id among the docs containing it — and every
    * doc that is NOT the owner drops the window's [[SpanN]] token
    * positions (union over overlapping windows). Output: per-doc
    * total/stripped/kept token counts plus the fingerprint of the cleaned
    * token sequence — the frame a rewrite pass would persist. Windows
    * hotter than the DF cap are corpus boilerplate (licence headers,
    * templates) — a different removal policy's job (strip from ALL docs,
    * no canonical copy), deliberately out of scope here, mirroring the
    * detection twin's evidence definition.
    */
  val spanStrip: GraftQuery = GraftQuery(
    "dedup_span_strip",
    s"exact-substring span removal: excise shared $SpanN-token windows whose canonical owner is another doc; kept/stripped counts + cleaned fingerprint",
    DedupOracle.spanStripSql) { (s, d) =>
    spanStripFrame(Tables.documents(s, d))
  }

  /** The span-strip pipeline over any (doc_id, text) frame.
    *
    * Scale shape: the window-occurrence frame is O(corpus tokens) and its
    * stats groupBy is the one corpus-sized shuffle (same volume as the
    * detection path's inverted index — no pair join anywhere). The
    * positional REWRITE (posexplode + coverage join + ordered
    * re-concatenation) runs ONLY over docs that actually lose a span —
    * clean docs short-circuit to md5(text), which equals the cleaned
    * fingerprint exactly because tokens are a single-space split (the
    * split/join round-trip is the identity). At 100 TB that asymmetry is
    * the operator: duplication-affected docs are a small fraction of the
    * corpus, and only they pay the per-position machinery.
    */
  def spanStripFrame(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = docs.select(col("doc_id"), col("text"),
      tokens(col("text")).as("toks"))
    // every window OCCURRENCE with its 1-based start position — NOT
    // distinct (coverage is positional; a window repeated within a doc
    // covers both sites). Materialized: feeds the stats agg AND the
    // coverage join.
    val occ = base.select(col("doc_id"),
        posexplode(shingles(col("toks"), SpanN)))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("sh"))
      .localCheckpoint()
    val shared = occ.groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("ndocs"),
        min(col("doc_id")).as("owner"))
      .filter(col("ndocs") >= 2 && col("ndocs") <= NgramDfCap)
      .select(col("sh"), col("owner"))
    // covered token positions: union of [p, p+SpanN-1] over every shared
    // window owned by another doc
    val covered = occ.join(shared, "sh")
      .filter(col("doc_id") =!= col("owner"))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + lit(SpanN - 1))).as("pos"))
      .distinct()
      .localCheckpoint()
    val strippedDocs = covered.select(col("doc_id")).distinct().localCheckpoint()
    // positional rewrite for AFFECTED docs only (semi-join prune, size-
    // guarded broadcast — same discipline as the verify prunes; guarded
    // once, reused by the semi AND anti side)
    val strippedBc = maybeBroadcast(strippedDocs)
    val tp = base.join(strippedBc, Seq("doc_id"), "semi")
      .select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val flagged = tp.join(covered.withColumn("cov", lit(true)),
      Seq("doc_id", "pos"), "left")
    val counts = flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("total_tokens"),
        sum(when(col("cov"), 1L).otherwise(0L)).as("stripped_tokens"))
    // cleaned fingerprint: md5 of the surviving tokens in position order
    // (array_sort on (pos, tok) structs makes the collect_list order-
    // insensitive under any partitioning)
    val kept = flagged.filter(col("cov").isNull)
      .groupBy(col("doc_id"))
      .agg(md5(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          st => st.getField("tok")))).as("kept_fp"))
    val rewritten = counts.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("total_tokens"), col("stripped_tokens"),
        coalesce(col("kept_fp"), md5(lit(""))).as("kept_fp"))
    val clean = base.join(strippedBc, Seq("doc_id"), "anti")
      .select(col("doc_id"), size(col("toks")).cast("long").as("total_tokens"),
        lit(0L).as("stripped_tokens"), md5(col("text")).as("kept_fp"))
    rewritten.unionByName(clean)
      .select(col("doc_id"), col("total_tokens"), col("stripped_tokens"),
        (col("total_tokens") - col("stripped_tokens")).as("kept_tokens"),
        col("kept_fp"))
      .orderBy("doc_id")
  }

  /** Longest verbatim common span per pair — the "HOW verbatim is this
    * pair" signal the span family lacked: [[spanOverlap]] counts shared
    * windows (a bag statistic — 40 scattered quotations and one 47-token
    * verbatim block both count 40), while C4/RefinedWeb-style policies
    * threshold on the longest CONTIGUOUS run. A run of r consecutive
    * shared [[SpanN]]-token windows on a common diagonal (pa − pb
    * constant — positions advancing together in BOTH docs, the BLAST
    * seed-chaining identity) is a verbatim common substring of
    * r + SpanN − 1 tokens; the max run per pair is found with one
    * gaps-and-islands window (island id = pa − row_number within the
    * pair's diagonal) over the positional match frame — no new mine
    * beyond the span family's inverted index, and integer-only, so no
    * determinism machinery at all.
    *
    * Scale shape: the cap here is the POSITIONAL tightening of the span
    * family's DF cap — total occurrences per window value <= [[NgramDfCap]]
    * (occurrences >= distinct docs, so every DF-capped list this keeps is
    * also occurrence-bounded): posting lists stay <= cap ROWS even for a
    * window repeated inside one doc, the diagonal join fans out <= cap^2
    * per window, and the islands window partitions by (pair, diag) —
    * keys whose cardinality the cap already bounds.
    */
  val longestSpan: GraftQuery = GraftQuery(
    "dedup_longest_span",
    s"longest verbatim common span per pair: max run of consecutive shared $SpanN-token windows, top-20",
    DedupOracle.longestSpanSql) { (s, d) =>
    longestSpanFrame(Tables.documents(s, d))
  }

  /** The longest-common-span pipeline over any (doc_id, text) frame. */
  def longestSpanFrame(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val pos = docs
      .select(col("doc_id"), posexplode(shingles(tokens(col("text")), SpanN)))
      .select(col("doc_id"), col("pos"), col("col").as("sh"))
    val capped = pos
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("occ") <= NgramDfCap)
      .drop("occ")
      .localCheckpoint()
    val m = capped.as("x")
      .join(capped.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.pos").as("pa"), (col("x.pos") - col("y.pos")).as("diag"))
    // pa is unique within (pair, diag): pb = pa - diag, and a position
    // holds one window — row_number needs no extra tie-break
    val wIsl = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    val runs = m
      .withColumn("grp", col("pa") - row_number().over(wIsl))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("run"))
    runs.groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("run")).as("n_window_matches"),
        max(col("run")).as("longest_run"))
      .select(col("doc_a"), col("doc_b"), col("n_window_matches"),
        col("longest_run"),
        (col("longest_run") + lit(SpanN - 1).cast("long"))
          .as("longest_span_tokens"))
      .orderBy(desc("longest_span_tokens"), col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Corpus duplication-mass dashboard — the memorization-risk number a
    * pretraining report quotes (C4/Lee-et-al-style): what fraction of each
    * language's TOKENS sits inside a verbatim [[SpanN]]-token window that
    * also appears in at least one OTHER document. Unlike the span
    * pair/strip operators this is a pure aggregate, so the window stats
    * are UNCAPPED — no self-join exists for a hot window to blow up, and
    * the dashboard must count boilerplate mass, not hide it. Cost: the
    * positional window frame (O(corpus tokens)), one groupBy for the
    * corpus-wide window document-frequencies, a coverage join restricted
    * to duplicated windows, and a per-language rollup.
    */
  val dupSpanMass: GraftQuery = GraftQuery(
    "corpus_dup_span_mass",
    s"duplication mass: per-language fraction of tokens covered by cross-doc verbatim $SpanN-token windows",
    DedupOracle.dupSpanMassSql) { (s, d) =>
    dupSpanMassFrame(Tables.documents(s, d))
  }

  /** The duplication-mass pipeline over any (doc_id, lang, text) frame. */
  def dupSpanMassFrame(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = docs.select(col("doc_id"), col("lang"),
      tokens(col("text")).as("toks"))
    val occ = base.select(col("doc_id"),
        posexplode(shingles(col("toks"), SpanN)))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("sh"))
      .localCheckpoint()
    val shared = occ.groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select(col("sh"))
    val coveredPerDoc = occ.join(shared, "sh")
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + lit(SpanN - 1))).as("pos"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dup_toks"))
    base.select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_toks"))
      .join(coveredPerDoc, Seq("doc_id"), "left")
      .select(col("lang"), col("n_toks"),
        coalesce(col("dup_toks"), lit(0L)).as("dup_toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dup_toks") > 0, 1L).otherwise(0L)).as("docs_with_dup"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("dup_toks")).as("dup_tokens"),
        (sum(col("dup_toks")) / sum(col("n_toks"))).as("dup_token_frac"))
      .orderBy("lang")
  }

  /** Near-dup graph health: how many J >= [[ClusterJaccard]] edges each
    * document carries, as a degree histogram (degree 0 = clean docs). The
    * graph-quality artifact behind [[clusters]]: a fat tail here means a
    * template/boilerplate hub is stitching unrelated docs into one giant
    * component, the classic large-scale dedup failure mode — this is the
    * dashboard number that catches it before cluster assignment runs.
    * Cost: the same capped pair frame, then two corpus-size-bounded aggs
    * (degrees, then the tiny histogram).
    */
  val degreeHistogram: GraftQuery = GraftQuery(
    "dedup_degree_histogram",
    s"near-dup graph health: per-doc J>=$ClusterJaccard edge-degree histogram",
    DedupOracle.degreeHistogramSql) { (s, d) =>
    val docs = Tables.documents(s, d)
    val edges = sharedNgramPairs(s, d)
      .filter(col("jaccard") >= ClusterJaccard)
    val deg = edges.select(col("doc_a").as("doc_id"))
      .unionByName(edges.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    docs.select(col("doc_id"))
      .join(deg, Seq("doc_id"), "left")
      .select(coalesce(col("degree"), lit(0L)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
      .orderBy("degree")
  }

  /** LSH index-quality grading — the [[graft.sim.SimQueries]]
    * `ann_lsh_recall` convention applied to the dedup side: of the exact
    * J >= [[ClusterJaccard]] pairs minable at the MinHash shingle width
    * (DF-capped 2-gram inverted index — the same discipline as every
    * exact miner), what fraction does the banded MinHash candidate set
    * contain, and how well does the 12-component signature estimate
    * (matching minhashes / k) track true Jaccard on the verified
    * candidates? The probe-cost/quality trade of the LSH screen as an
    * oracle-checked artifact: recall says what the bands MISS, the MAE
    * says how far the sketch drifts where they hit.
    */
  val lshRecallDedup: GraftQuery = GraftQuery.oneRow(
    "dedup_lsh_recall",
    s"LSH grading: band-candidate recall of exact 2-gram J>=$ClusterJaccard pairs + signature MAE",
    DedupOracle.lshRecallSql) { (s, d) =>
    import graft.api.Det
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val tok = tokenizedDocs(Tables.documents(s, d))
    // shingle explodes stay map-side re-runs from the checkpointed token
    // frame — materializing the full shingle frame was A/B'd and LOST
    // (the barrier write costs more than the re-explodes it saves, the
    // same result as clustersMulti's verify path)
    def sh = tok.select(col("doc_id"),
      explode(array_distinct(shingles(col("toks"), MinhashShingleN))).as("sh"))
    // the truth miner's posting materialization and the whole banded
    // verify pipeline are INDEPENDENT until the final aggregates — run
    // their eager checkpoint jobs from concurrent threads (the
    // clustersMulti overlap pattern: deterministic frames, only
    // wall-clock changes; A/B'd 1.74 -> ~1.3 s at sf0.1)
    val truthF = Future(capPostings(sh))
    // ONE signature aggregation (the duplicated SHUFFLE of the round-10
    // shape), shared by the banded verify path and the per-component
    // match columns below
    val verestF = Future {
      val sigs = minhashSigs(sh).localCheckpoint()
      val matches = (0 until MinhashK).map(i =>
        when(col(s"sa.s$i") === col(s"sb.s$i"), 1).otherwise(0)).reduce(_ + _)
      minhashJaccardFromShingles(sh, Some(sigs))
        .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sigs.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          (matches.cast("double") / lit(MinhashK)).as("est"))
        .localCheckpoint()
    }
    val truth = jaccardPairs(Await.result(truthF, Duration.Inf), lit(true))
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a").as("ta"), col("doc_b").as("tb"))
    val verest = Await.result(verestF, Duration.Inf)
    // n_truth and n_caught in ONE pass: left join against the (distinct-
    // pair) candidate set, count(*) vs count(matched). truth then has a
    // single consumer, so it needs no materialization barrier — one
    // fewer eager checkpoint job than the round-10 shape (A/B'd: the
    // barrier was ~0.4 s of pure serialization on an unshared frame).
    val tgAgg = truth.join(verest
        .select(col("doc_a"), col("doc_b"), lit(1).as("hit")),
        col("ta") === col("doc_a") && col("tb") === col("doc_b"), "left")
      .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_caught"))
    val cAgg = verest.agg(count(lit(1)).as("n_cand"),
      (sum(Det.quantize(abs(col("est") - col("jaccard")), 9)) /
        (lit(Det.pow10(9)) * count(lit(1)))).as("sig_mae"))
    tgAgg.crossJoin(cAgg)
      .select(col("n_truth"), col("n_cand"), col("n_caught"),
        // zero-guard: on a slice with no exact J>=t pairs Spark's 0/0
        // and DuckDB's diverge (NULL vs NaN) — pin the degenerate case
        // to NULL on both engines
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(col("n_caught") / col("n_truth")).as("recall"),
        col("sig_mae"))
  }

  /** The (bands × rows) geometries [[lshTuning]] sweeps — every way to
    * cut the [[MinhashK]]=12 signature into equal bands. The deployed
    * config is (4, [[BandRows]]=3).
    */
  val LshTuneConfigs: Seq[(Int, Int)] =
    Seq((12, 1), (6, 2), (4, 3), (3, 4), (2, 6))

  /** LSH PARAMETER TUNING — the design-tool sweep behind
    * [[lshRecallDedup]]'s single-config grade: every (bands, rows) cut
    * of the SAME 12-component signature frame mines its own candidate
    * set (band keys, bucket cap, self-join — the production pipeline at
    * each geometry), graded against ONE shared exact truth set
    * (DF-capped 2-gram pairs at J ≥ [[ClusterJaccard]], the
    * [[lshRecallDedup]] truth) plus the theoretical s-curve collision
    * probability 1−(1−J^r)^b at the threshold (Scala-computed literal,
    * identical on both engines). More rows per band → sharper curve →
    * fewer candidates and lower recall at fixed signature budget; this
    * is the table you pick (b, r) from before a 100 TB dedup run,
    * produced by the engine itself instead of a notebook.
    *
    * Scale shape: signatures aggregate ONCE (checkpointed) and each
    * config re-bands that doc-bounded frame — the corpus-sized shingle
    * work is never repeated; candidate mining stays bucket-capped per
    * config; the truth miner is the grading-only cost. Determinism:
    * counts are exact; recall is one LONG/LONG division; the theory
    * column is a shared literal.
    */
  val lshTuning: GraftQuery = GraftQuery(
    "dedup_lsh_tuning",
    s"LSH (bands x rows) sweep over one MinHash($MinhashK) signature set: candidates/recall per config + s-curve theory",
    DedupOracle.lshTuningSql) { (s, d) =>
    val tok = tokenizedDocs(Tables.documents(s, d))
    def sh = tok.select(col("doc_id"),
      explode(array_distinct(shingles(col("toks"), MinhashShingleN)))
        .as("sh"))
    val truth = jaccardPairs(capPostings(sh), lit(true))
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a").as("ta"), col("doc_b").as("tb"))
      .localCheckpoint()
    val sigs = minhashSigs(sh).localCheckpoint()
    // ALL five geometries band in ONE pass, keyed by (cfg, b, bk): the
    // per-config loop ran the window-cap + self-join + distinct +
    // checkpoint pipeline five times over the same signature frame — five
    // band shuffles, five pair shuffles, ~5x the AQE/job overhead — for
    // the SAME total band-row count (Σ bands per config = 27 rows/doc
    // either way). With the config id in the bucket key the single
    // window cap, self-join and distinct are per-config by construction
    // (different cfg values never share a partition key), so the outputs
    // are row-identical to the per-config runs (guide §2.4: one exchange
    // doing the work of five). The theory column and the zero-candidate
    // rows come from a 5-row literal config frame left-joined against the
    // per-cfg aggregates.
    val bandStructs = LshTuneConfigs.flatMap { case (b, r) =>
      (0 until b).map { bi =>
        val key = md5(concat_ws(":",
          (0 until r).map(ri => col(s"s${bi * r + ri}")): _*))
        struct(lit(b).as("cfg"), lit(bi).as("b"), key.as("bk"))
      }
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.cfg").as("cfg"),
        col("band.b").as("b"), col("band.bk").as("bk"))
    val capped = bands
      .withColumn("bc", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("cfg"), col("b"), col("bk"))))
      .filter(col("bc") <= BandBucketCap)
      .drop("bc")
    val cand = capped.as("x")
      .join(capped.as("y"),
        col("x.cfg") === col("y.cfg") && col("x.b") === col("y.b")
          && col("x.bk") === col("y.bk")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.cfg").as("cfg"), col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"))
      .distinct()
      .localCheckpoint()
    val nCand = cand.groupBy(col("cfg")).agg(count(lit(1)).as("n_cand"))
    // caught per config: candidate pairs are distinct, so the inner join
    // counts exactly the truth pairs each geometry catches (the old
    // left-join count(hit) under a per-config frame)
    val caught = truth
      .join(cand, col("ta") === col("doc_a") && col("tb") === col("doc_b"))
      .groupBy(col("cfg")).agg(count(lit(1)).as("n_caught"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val cfgRows = LshTuneConfigs.map { case (b, r) =>
      val pTheory = 1.0 -
        math.pow(1.0 - math.pow(ClusterJaccard, r), b)
      struct(lit(b).as("cfg"), lit(b).as("bands"),
        lit(r).as("rows_per_band"), lit(pTheory).as("p_collide_at_threshold"))
    }
    s.range(1).select(explode(array(cfgRows: _*)).as("c"))
      .select(col("c.cfg").as("cfg"), col("c.bands").as("bands"),
        col("c.rows_per_band").as("rows_per_band"),
        col("c.p_collide_at_threshold").as("p_collide_at_threshold"))
      .join(nCand, Seq("cfg"), "left")
      .join(caught, Seq("cfg"), "left")
      .crossJoin(broadcast(nTruth))
      .select(col("bands"), col("rows_per_band"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"), col("n_truth"),
        coalesce(col("n_caught"), lit(0L)).as("n_caught"),
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(coalesce(col("n_caught"), lit(0L)) / col("n_truth"))
          .as("recall"),
        col("p_collide_at_threshold"))
      .orderBy("rows_per_band")
  }

  /** GROUP-AWARE TRAIN/VAL/TEST SPLIT — the ACTION
    * `dedup_split_leakage` diagnoses the need for: the per-doc content
    * hash split leaks near-dup pairs across the eval boundary (36% of
    * dup pairs at gate SF), so the fix is the GroupShuffleSplit
    * discipline — split by NEAR-DUP CLUSTER, not by doc: CC labels over
    * the J ≥ [[ClusterJaccard]] evidence give each doc its group key
    * (singletons group with themselves), and the content hash of the
    * GROUP key decides the whole group's split — a mined near-dup pair
    * can then never straddle splits, which the query PROVES by
    * recounting (cross_pairs_grouped, structurally 0) next to the
    * doc-hash split's count over the same pairs (the number this
    * operator fixes). Per-split doc/group budgets ride along.
    *
    * Scale shape: rides the shared pair miner + the size-adaptive CC
    * (both already persisted/bounded); the split decision is a pure
    * per-group hash; leakage recounts are two narrow id-keyed joins
    * over the pair frame. Determinism: CC min-label fixpoint, hash60
    * of the rendered group key, exact counts.
    */
  val groupedSplits: GraftQuery = GraftQuery(
    "doc_splits_grouped",
    s"group-aware 80/10/10 split by near-dup cluster (J>=$ClusterJaccard): leakage-free by construction, doc-hash comparison",
    DedupOracle.groupedSplitsSql) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairsAll = sharedNgramPairs(s, d)
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val labels = connectedComponents(
      pairsAll.select(col("doc_a").as("a"), col("doc_b").as("b")))
    val grouped = docs.select(col("doc_id"))
      .join(labels.select(col("node").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .withColumn("gkey", coalesce(col("label"), col("doc_id")))
      .withColumn("bucket", graft.text.TextFns.hash60(
        concat(lit("grp:"), col("gkey").cast("string"))) % 100)
      .withColumn("split", when(col("bucket") < 80, "train")
        .when(col("bucket") < 90, "val").otherwise("test"))
      .localCheckpoint()
    val sa = grouped.select(col("doc_id").as("doc_a"),
      col("split").as("split_a"))
    val sb = grouped.select(col("doc_id").as("doc_b"),
      col("split").as("split_b"))
    val crossG = pairsAll.join(sa, "doc_a").join(sb, "doc_b")
      .agg(
        sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L))
          .as("cross_pairs_grouped"),
        count(lit(1)).as("n_dup_pairs"))
    val dh = docs.select(col("doc_id"),
        (graft.text.TextFns.hash60(
          graft.text.TextFns.normText(col("text"))) % 100).as("b2"))
      .withColumn("split_dh", when(col("b2") < 80, "train")
        .when(col("b2") < 90, "val").otherwise("test"))
    val da = dh.select(col("doc_id").as("doc_a"), col("split_dh").as("dha"))
    val db = dh.select(col("doc_id").as("doc_b"), col("split_dh").as("dhb"))
    val crossD = pairsAll.join(da, "doc_a").join(db, "doc_b")
      .agg(sum(when(col("dha") =!= col("dhb"), 1L).otherwise(0L))
        .as("cross_pairs_dochash"))
    grouped.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("gkey")).as("n_groups"))
      .crossJoin(broadcast(crossG)).crossJoin(broadcast(crossD))
      .select(col("split"), col("n_docs"), col("n_groups"),
        col("n_dup_pairs"), col("cross_pairs_grouped"),
        col("cross_pairs_dochash"),
        (col("cross_pairs_grouped") === 0L).as("leakage_free"))
      .orderBy("split")
  }

  /** Exact-dup ingest screen — the EXACT-hash counterpart of
    * [[incrementalScreen]], composed with the runtime-filter machinery:
    * an incoming batch (doc_id % [[BloomBatchModulus]] ==
    * [[BloomBatchResidue]] — an ID split on purpose: the
    * content-hash split would put byte-identical docs on the SAME side by
    * construction, so exact dups could never straddle it) is screened
    * against the existing corpus's fingerprint set. The corpus side
    * builds a `bloom_filter_agg` over its fingerprints; incoming docs
    * probe it with `might_contain` BEFORE the verify join, so at 100 TB
    * the join's probe side shrinks to the bloom-positive sliver (false
    * positives are removed by the exact join, false negatives are
    * impossible — the oracle is the PLAIN fingerprint join, proving the
    * prefilter semantics-free). Every incoming doc reports its verdict;
    * matches resolve to the smallest existing doc_id.
    */
  val bloomScreen: GraftQuery = GraftQuery(
    "dedup_bloom_screen",
    "exact-dup ingest screen: incoming batch bloom-prefiltered against corpus fingerprints, join-verified",
    DedupOracle.bloomScreenSql) { (s, d) =>
    bloomScreenFrame(Tables.documents(s, d))
  }

  /** Per-session counter for unique bloom-screen view names. */
  private val bloomViewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** The bloom-screen pipeline over any (doc_id, text) frame. */
  private[graft] def bloomScreenFrame(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    graft.functions.GraftFunctions.register(s)
    val base = docs.select(col("doc_id"),
      (col("doc_id") % BloomBatchModulus === BloomBatchResidue).as("incoming"),
      graft.text.TextFns.fingerprint(col("text")).as("fp"))
    val inc = base.filter(col("incoming"))
      .select(col("doc_id").as("inc_doc"), col("fp"))
    val ex = base.filter(!col("incoming"))
      .select(col("doc_id").as("ex_doc"), col("fp"))
    // might_contain demands its filter side be a scalar subquery (the
    // shape InjectRuntimeFilter emits), so the probe goes through SQL —
    // on UNIQUE per-call view names (concurrent/nested pipelines must not
    // clobber each other), resolved eagerly by sql() then dropped
    val tag = bloomViewSeq.incrementAndGet()
    val exView = s"bloom_corpus_fp_$tag"
    val incView = s"bloom_incoming_fp_$tag"
    ex.createOrReplaceTempView(exView)
    inc.createOrReplaceTempView(incView)
    val pre =
      try s.sql(s"""
        SELECT inc_doc, fp FROM $incView
        WHERE might_contain(
          (SELECT bloom_filter_agg(xxhash64(fp), 100000L, 800000L)
           FROM $exView),
          xxhash64(fp))""")
      finally {
        s.catalog.dropTempView(incView)
        s.catalog.dropTempView(exView)
      }
    val matches = pre.join(ex, "fp")
      .groupBy(col("inc_doc")).agg(min(col("ex_doc")).as("match_doc"))
    inc.join(matches, Seq("inc_doc"), "left")
      .select(col("inc_doc"), col("match_doc").isNotNull.as("is_dup"),
        col("match_doc"))
      .orderBy("inc_doc")
  }

  /** Damping, sweep count, and report size for [[pagerank]]. */
  val PrDamping = 0.85
  val PrIters = 3
  val PrTopK = 20

  /** PageRank over the near-dup graph — the ITERATIVE graph algorithm
    * beyond connected components: 3 power-iteration sweeps of
    * r' = (1-d)/N + d * sum(r_u / deg_u) over the undirected
    * J >= [[ClusterJaccard]] edge set, reporting the top-[[PrTopK]] hub
    * documents. Degree counts ([[degreeHistogram]]) see LOCAL hubs;
    * PageRank concentrates on the centers of large template families even
    * when each neighbor has modest degree — the doc to inspect first when
    * triaging a flooded corpus.
    *
    * Scale shape: the classic distributed PR contract — each sweep is one
    * equi-join of the materialized edge list against the N-row rank frame
    * plus one groupBy(dst); model state (ranks) moves, edges never
    * re-mine (localCheckpointed once, superseded sweeps point-released —
    * the [[connectedComponents]] block discipline). N is a driver-side
    * count: iteration constant, not data.
    *
    * Determinism: each source's r/deg contribution is quantized to a
    * 1e-12 LONG per SOURCE node (one quantization per node-sweep, the
    * kmeans/bigram-LM recipe), so per-target sums are exact and
    * partition-order-free; the damping update is correctly-rounded IEEE
    * arithmetic with the same association as the DuckDB twin's unrolled
    * 3-sweep CTE chain.
    */
  val pagerank: GraftQuery = GraftQuery(
    "dedup_pagerank",
    s"PageRank over the J >= $ClusterJaccard near-dup graph: $PrIters sweeps, top-$PrTopK hubs",
    DedupOracle.pagerankSql) { (s, d) =>
    pagerankFrame(sharedNgramPairs(s, d)
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a"), col("doc_b")))
  }

  /** The PR power iteration over any undirected (doc_a, doc_b) edge frame. */
  def pagerankFrame(pairsIn: DataFrame): DataFrame = {
    // bi is read every sweep -> checkpoint it; the pairs input needs no
    // checkpoint of its own since the registry path reads the persisted
    // shared pair table (two scans of parquet, not two mine runs)
    val bi = pairsIn.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairsIn.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    val deg = bi.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val n = deg.count()
    var r = deg.select(col("node"), col("deg"),
      (lit(1.0) / lit(n.toDouble)).as("rank"))
    for (i <- 1 to PrIters) {
      val contrib = bi.join(r.withColumnRenamed("node", "rn"),
          col("src") === col("rn"))
        .select(col("dst"),
          floor(col("rank") / col("deg") * lit(1e12) + lit(0.5))
            .cast("long").as("cq"))
      val next = deg.join(
          contrib.groupBy(col("dst")).agg(sum(col("cq")).as("sq")),
          col("node") === col("dst"))
        .select(col("node"), col("deg"),
          (lit(1.0 - PrDamping) / lit(n.toDouble) +
            lit(PrDamping) * (col("sq") / lit(1e12))).as("rank"))
        .localCheckpoint()
      if (i > 1) graft.api.Checkpoints.release(r)
      r = next
    }
    r.select(col("node").as("doc_id"), col("deg"), col("rank"))
      .orderBy(desc("rank"), col("doc_id"))
      .limit(PrTopK)
  }

  /** Synchronous LPA sweeps ([[communities]]). */
  val LpaIters = 3

  /** Label-propagation COMMUNITIES over the near-dup graph — the graph
    * family's missing grouping grain: CC answers reachability (everything
    * transitively connected is one cluster), LPA answers cohesion (a
    * dense template farm and a chain of borderline pairs in the same
    * component get DIFFERENT labels). A new propagation class too: CC
    * propagates the MIN label (a lattice meet — order-free), LPA
    * propagates the MODE of the neighbor labels, which needs a per-node
    * vote count + deterministic argmax each sweep. [[LpaIters]]
    * synchronous sweeps (every node updates from the PREVIOUS sweep's
    * labels — the only order-free schedule), ties broken (count DESC,
    * label ASC); a fixed sweep count makes the artifact well-defined even
    * where asynchronous LPA would oscillate.
    *
    * 100 TB shape: a sweep is one edge-frame join + one (node, label)
    * partial-agg + one per-node window argmax — all keyed by node id,
    * shuffle-bounded by the EDGE count (the mined near-dup graph, already
    * capped), never the corpus; labels checkpoint per sweep with the CC
    * release discipline. Output: every community's size and internal
    * edge count (size DESC total order) — internal_edges counts each
    * undirected edge once via the src < dst direction.
    */
  val communities: GraftQuery = GraftQuery(
    "dedup_communities",
    s"label-propagation communities over the J >= $ClusterJaccard near-dup graph: $LpaIters synchronous sweeps, size + internal edges",
    DedupOracle.communitiesSql) { (s, d) =>
    communitiesFrame(sharedNgramPairs(s, d)
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a"), col("doc_b")))
  }

  /** LPA over any undirected (doc_a, doc_b) edge frame. */
  def communitiesFrame(pairsIn: DataFrame): DataFrame = {
    // bi feeds every sweep's vote join AND the internal-edge count ->
    // checkpoint; pairsIn itself is a persisted-table read on the
    // registry path (see pagerankFrame)
    val bi = pairsIn.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairsIn.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var lab = bi.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(desc("n"), col("label"))
    for (i <- 1 to LpaIters) {
      val next = bi
        .join(lab.withColumnRenamed("node", "ln"), col("dst") === col("ln"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("src").as("node"), col("label"))
        .localCheckpoint()
      if (i > 1) graft.api.Checkpoints.release(lab)
      lab = next
    }
    val sizes = lab.groupBy(col("label")).agg(count(lit(1)).as("size"))
    val internal = bi.filter(col("src") < col("dst"))
      .join(lab.select(col("node").as("sn"), col("label").as("sl")),
        col("src") === col("sn"))
      .join(lab.select(col("node").as("dn"), col("label").as("dl")),
        col("dst") === col("dn"))
      .filter(col("sl") === col("dl"))
      .groupBy(col("sl").as("il"))
      .agg(count(lit(1)).as("ie"))
    sizes.join(internal, col("label") === col("il"), "left")
      .select(col("label").as("community_id"), col("size"),
        coalesce(col("ie"), lit(0L)).as("internal_edges"))
      .orderBy(desc("size"), col("community_id"))
  }

  /** The cross-subsystem dedup pipeline as ONE composed artifact — the
    * stage funnel a production corpus actually runs, in order: (1) exact
    * dedup (keep min doc_id per md5-normalized fingerprint), (2) TEXT
    * near-dup CC over J >= [[ClusterJaccard]] edges restricted to
    * stage-1 survivors, keep each cluster's min id, (3) SEMANTIC
    * (SemDeDup) CC over intra-cell cosine edges restricted to stage-2
    * survivors, keep min id. Each stage's edge set is filtered to the
    * prior stage's survivor set BEFORE components run — the ordering
    * semantics that make staged dedup different from intersecting three
    * independent screens (an edge to an already-dropped doc must not
    * drop its partner). Per-language monotone survivor counts; at scale
    * the stages share the scans their standalone queries already use
    * and the survivor filters are id-keyed semi-joins.
    */
  val stageFunnel: GraftQuery = GraftQuery(
    "dedup_stage_funnel",
    "staged dedup funnel: exact -> text near-dup CC -> semantic CC, per-language survivor counts",
    DedupOracle.stageFunnelSql) { (s, d) =>
    import graft.text.TextFns
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val docs = Tables.documents(s, d)
    // the TEXT pair mine and the SEMANTIC edge mine (kmeans training +
    // intra-cell pair join) depend on NO earlier stage — only their
    // survivor FILTERS do — so both mines run concurrently with the
    // stage-1/2 sequence and are filtered when their stage arrives
    // (same-window warm A/B at sf0.1: 5.8 -> 2.7 s)
    val tEdgesF = Future(sharedNgramPairs(s, d)
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .localCheckpoint())
    val sEdgesF = Future(
      graft.sim.SimQueries.semanticEdges(s, d).localCheckpoint())
    val base = docs.select(col("doc_id"), col("lang"),
      TextFns.fingerprint(col("text")).as("fp"))
    // stage 1: exact — keep min doc_id per fingerprint
    val w1 = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val s1 = base
      .withColumn("keep1", col("doc_id") === min(col("doc_id")).over(w1))
      .select(col("doc_id"), col("lang"), col("keep1"))
      .localCheckpoint()
    val s1ids = s1.filter(col("keep1")).select(col("doc_id"))
    // stage 2: text near-dup CC over surviving endpoints only
    val tEdges = Await.result(tEdgesF, Duration.Inf)
      .join(s1ids.select(col("doc_id").as("a")), Seq("a"), "semi")
      .join(s1ids.select(col("doc_id").as("b")), Seq("b"), "semi")
    val tLab = connectedComponents(tEdges)
    val s2 = s1.filter(col("keep1"))
      .join(tLab, col("doc_id") === col("node"), "left")
      .withColumn("keep2", col("label").isNull || col("label") === col("doc_id"))
      .select(col("doc_id"), col("lang"), col("keep2"))
      .localCheckpoint()
    val s2ids = s2.filter(col("keep2")).select(col("doc_id"))
    // stage 3: semantic CC over stage-2 survivors (vec_id == doc_id)
    val sEdges = Await.result(sEdgesF, Duration.Inf)
      .join(s2ids.select(col("doc_id").as("a")), Seq("a"), "semi")
      .join(s2ids.select(col("doc_id").as("b")), Seq("b"), "semi")
    val sLab = connectedComponents(sEdges)
    val s3 = s2.filter(col("keep2"))
      .join(sLab, col("doc_id") === col("node"), "left")
      .withColumn("keep3", col("label").isNull || col("label") === col("doc_id"))
      .select(col("doc_id"), col("lang"), col("keep3"))
    val ingest = base.groupBy(col("lang")).agg(count(lit(1)).as("n_ingest"))
    val k1 = s1.filter(col("keep1")).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_exact_kept"))
    val k2 = s2.filter(col("keep2")).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_textdedup_kept"))
    val k3 = s3.filter(col("keep3")).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_semantic_kept"))
    ingest.join(k1, "lang").join(k2, "lang").join(k3, "lang")
      .orderBy("lang")
  }

  /** Quality-aware keeper selection — the refinement of the min-id keep
    * rule every serious dedup pipeline ships: within each near-dup
    * cluster keep the HIGHEST-QUALITY document (the [[graft.text
    * .TextQueries.sampleWeighted]] score: length saturation x stopword
    * penalty), ties to the smaller doc_id; singletons keep themselves.
    * The per-language report counts kept/dropped and — the number that
    * justifies the extra window — `n_quality_wins`: kept docs that are
    * NOT their cluster's min doc_id, i.e. where quality-aware selection
    * actually changed the outcome. Cost on top of [[clusters]]: one
    * cluster-partitioned window over the labeled docs (the labels frame
    * is edge-bounded; docs outside any cluster take the coalesce path
    * and never shuffle by cluster... they do ride the window shuffle,
    * keyed by their own id — uniform by construction).
    */
  val keepBest: GraftQuery = GraftQuery(
    "dedup_keep_best",
    "quality-argmax keeper per near-dup cluster: per-language kept/dropped + quality-win count",
    DedupOracle.keepBestSql) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextFns
    val docs = Tables.documents(s, d)
    val scored = docs
      .withColumn("toks", TextFns.tokens(col("text")))
      .select(col("doc_id"), col("lang"),
        (least(lit(1.0), size(col("toks")) / lit(60.0)) *
          (lit(1.0) - TextFns.stopwordCount(col("toks"), TextFns.Stopwords) /
            size(col("toks")))).as("score"))
    val edges = sharedNgramPairs(s, d)
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val labels = connectedComponents(edges)
    val lbl = scored.join(labels, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), col("lang"), col("score"),
        coalesce(col("label"), col("doc_id")).as("cluster"))
    val wq = Window.partitionBy(col("cluster"))
      .orderBy(desc("score"), col("doc_id"))
    val ranked = lbl
      .withColumn("rn", row_number().over(wq))
      .withColumn("min_id",
        min(col("doc_id")).over(Window.partitionBy(col("cluster"))))
    ranked.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("rn") === 1).cast("long")).as("n_kept"),
        sum((col("rn") > 1).cast("long")).as("n_dropped"),
        sum((col("rn") === 1 && col("doc_id") =!= col("min_id")).cast("long"))
          .as("n_quality_wins"))
      .orderBy("lang")
  }

  /** Cross-source duplication matrix — WHERE the near-dup mass lives: the
    * J >= [[ClusterJaccard]] pairs bucketed by their endpoints' source
    * pair (unordered — least/greatest normalizes so each pair lands in
    * one upper-triangular cell), with each cell's share of all dup
    * pairs. The provenance dashboard behind scraper triage: a hot
    * diagonal cell is one source re-crawling itself (fix the crawler); a
    * hot off-diagonal cell is syndication/mirroring between sources
    * (dedup across them before sampling weights are computed, or the
    * mirrored mass is double-weighted). Cost on top of the shared miner:
    * two id-keyed joins against the narrow (doc_id, source) projection
    * and a |sources|²-bounded aggregate.
    */
  val sourceMatrix: GraftQuery = GraftQuery(
    "dedup_source_matrix",
    s"near-dup provenance matrix: J >= $ClusterJaccard pair counts per unordered source pair + share",
    DedupOracle.sourceMatrixSql) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val src = docs.select(col("doc_id"), col("source"))
    val pairs = sharedNgramPairs(s, d)
      .filter(col("jaccard") >= ClusterJaccard)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
    pairs.groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("share",
        col("n_pairs") / sum(col("n_pairs")).over(Window.partitionBy()))
      .orderBy("source_a", "source_b")
  }

  /** Triangle census of the near-dup graph — the graph-quality number
    * [[degreeHistogram]] (local hubs), [[pagerank]] (global hubs), and
    * [[clusters]] (reachability) don't see: TRANSITIVITY. Genuine
    * template families duplicate transitively (A~B, B~C implies A~C), so
    * their neighborhoods are triangle-dense; an edge-rich but
    * triangle-POOR graph is chains of incidental matches that CC will
    * over-merge — low transitivity here is the "inspect the threshold
    * before trusting cluster assignment" alarm. Reports edges, wedges
    * (open 2-paths), triangles, and global transitivity =
    * 3*triangles/wedges.
    *
    * Scale shape: the classic degree-oriented distributed triangle count
    * (Schank-Wagner): each edge is oriented from its lower-(degree, id)
    * endpoint, so every wedge join fans out from a vertex's LOWER-degree
    * neighbors — the quadratic term is Σ min-degreeᵈ, robust to hub skew
    * where the naive id-orientation explodes on a high-degree node; the
    * closure check is one semi-join against the canonical edge list. All
    * counts are exact BIGINTs; transitivity is one IEEE division,
    * zero-guarded to NULL on an edgeless corpus on both engines.
    */
  val triangles: GraftQuery = GraftQuery.oneRow(
    "dedup_triangles",
    s"near-dup graph triangle census: edges/wedges/triangles + transitivity (J >= $ClusterJaccard)",
    DedupOracle.trianglesSql) { (s, d) =>
    triangleStats(sharedNgramPairs(s, d)
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a"), col("doc_b")))
  }

  /** The census over any canonical (doc_a < doc_b) edge frame, so the
    * spec can drive a hand-computable graph.
    */
  private[graft] def triangleStats(edgesIn: DataFrame): DataFrame = {
    val e = edgesIn.localCheckpoint()
    val bi = e.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(e.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .localCheckpoint()
    graft.api.Checkpoints.release(e)
    val deg = bi.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // orient each edge away from its smaller (deg, id) endpoint
    val oriented = bi
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .filter(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select(col("u"), col("v"))
      .localCheckpoint()
    // wedges centered on the oriented source close iff (p, q) is an edge;
    // p < q by construction, so the canonical edge list checks it directly
    val wedgePairs = oriented.as("x")
      .join(oriented.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.v").as("p"), col("y.v").as("q"))
    val triCanon = bi.filter(col("u") < col("v"))
    val tAgg = wedgePairs
      .join(triCanon, col("p") === col("u") && col("q") === col("v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val eAgg = triCanon.agg(count(lit(1)).as("n_edges"))
    val wAgg = deg.agg(
      sum((col("deg") * (col("deg") - 1) / lit(2)).cast("long")).as("n_wedges"))
    eAgg.crossJoin(wAgg).crossJoin(tAgg)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(null).cast("double"))
          .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges"))
          .as("transitivity"))
  }

  /** Jaccard threshold for [[prefixFilterPairs]] — deliberately HIGHER
    * than [[ClusterJaccard]]: the prefix length is |d| - ceil(t*|d|) + 1,
    * so at t = 0.5 HALF of every doc's shingles are indexed and the
    * filter barely prunes (measured 46 s at sf0.1 — a scale killer),
    * while at 0.8 only the rarest ~20% enter the join. 0.8 is the
    * regime prefix filtering is designed for (verbatim/near-verbatim
    * dup mining; the corpus's true near-dup pairs all sit at J >= 0.9,
    * so nothing is lost vs 0.5). Declared before the GraftQuery val
    * (oracle interpolation — the init-order rule).
    */
  val PrefixJaccard = 0.8

  /** Shingle width for [[prefixFilterPairs]] — 5-gram, the
    * near-verbatim-dup span width (C4-style), deliberately WIDER than
    * the 2/3-gram miners: prefix filtering lives or dies on feature
    * rarity, and on this corpus's dense small-vocabulary 2-gram space
    * even each doc's rarest-20% shingles have global df in the hundreds
    * (measured: 54k prefix postings -> 1.5M candidates, 46 s — a scale
    * killer), while 5-grams are near-unique (same prefix mass -> 255
    * candidates, a 6000x cut). The lesson is general: pick the prefix
    * feature so its df tail is actually thin.
    */
  val PrefixShingleN = 5

  /** PPJoin-style prefix-filtered exact similarity join — the THIRD
    * candidate-pruning family next to DF-capping (drop hot shingles —
    * changes the measured Jaccard) and MinHash banding (probabilistic —
    * misses pairs): prefix filtering is EXACT over the FULL shingle sets.
    * Order shingles globally by (document frequency, shingle); a pair
    * with Jaccard >= t MUST share one of each doc's first
    * |d| - ceil(t*|d|) + 1 shingles under that order (the All-Pairs/
    * PPJoin prefix lemma: J >= t forces overlap >= ceil(t*|d|), which
    * cannot fit inside the excluded suffix), so only PREFIX postings —
    * the rarest slice of every doc — enter the self-join, with the
    * length filter t*max(|A|,|B|) <= min(|A|,|B|) applied AT the join.
    * Candidates are then verified with exact full-set Jaccard. The
    * oracle runs the NAIVE uncapped full self-join — the join the
    * DF-capped miners refuse to run — proving both filters
    * semantics-free: same pairs, same Jaccard values, nothing dropped.
    * At 100 TB: no global rank is materialized (the (df, sh) pair IS the
    * order, ranked per-doc by a doc-partitioned window), prefix df is
    * low by construction (rare shingles first), and the verify touches
    * only candidate docs via the semi-join prune.
    */
  val prefixFilterPairs: GraftQuery = GraftQuery(
    "dedup_prefix_filter_pairs",
    s"PPJoin prefix-filtered exact Jaccard >= $PrefixJaccard over FULL $PrefixShingleN-gram sets; oracle = naive full join",
    DedupOracle.prefixFilterSql) { (s, d) =>
    prefixFilterFrame(Tables.documents(s, d))
  }

  /** The PPJoin pipeline over any (doc_id, text) frame, so the property
    * spec can drive generated corpora against an in-memory naive join.
    */
  private[graft] def prefixFilterFrame(docs: DataFrame): DataFrame = {
    val t = PrefixJaccard
    val sh = shingleSet(docs, PrefixShingleN)
      .localCheckpoint()
    val pref = prefixPostings(sh, t).localCheckpoint()
    val cand = pref.as("x")
      .join(pref.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id")
          && lit(t) * greatest(col("x.sz"), col("y.sz")) <=
            least(col("x.sz"), col("y.sz")))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val shc = sh.join(candDocs, Seq("doc_id"), "semi")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    cand
      .join(shc.as("xa"), col("doc_a") === col("xa.doc_id"))
      .join(shc.as("xb"),
        col("doc_b") === col("xb.doc_id") && col("xa.sh") === col("xb.sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("i") / (col("sa.n") + col("sb.n") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= t)
      .orderBy(desc("jaccard"), col("doc_a"), col("doc_b"))
  }

  /** The prefix-posting build for [[prefixFilterPairs]]: each doc's first
    * |d| - ceil(t*|d|) + 1 shingles under the global (df, sh) order, with
    * the doc's full size riding along for the length filter. Both windows
    * are doc_id-partitioned (PlanSpec pins it) — no global rank exists.
    * Un-checkpointed so the caller owns materialization and the spec can
    * inspect the plan.
    */
  private[graft] def prefixPostings(sh: DataFrame, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfFrame = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    sh.join(dfFrame, "sh")
      .withColumn("sz",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("pos", row_number().over(wdoc))
      .filter(col("pos") <= col("sz") - ceil(lit(t) * col("sz")) + 1)
      .select(col("doc_id"), col("sh"), col("sz"))
  }

  /** Core order and peel-sweep count for [[kcorePeel]]. */
  val KcoreK = 2
  val KcoreSweeps = 4

  /** k-core PEELING over the near-dup graph — the graph family's missing
    * density miner (CC finds reachability, PageRank finds hubs, triangles
    * find wedges; the k-core finds the subgraph where EVERY member keeps
    * ≥ k near-dup neighbors after all weakly-attached docs are peeled
    * away — boilerplate nests and template farms survive, star whiskers
    * don't). Iteration class is new too: degree-CONDITIONED peeling
    * (drop nodes under k, re-derive degrees, repeat), unlike CC's label
    * propagation or PR's value iteration. Output is the peeling curve —
    * (sweep, nodes, directed edges) for sweep 0..[[KcoreSweeps]] — plus
    * an IN-BAND fixpoint attestation: `converged` is true iff every
    * surviving node already has degree ≥ k, i.e. one more sweep would
    * change nothing (vacuously true on an empty core).
    *
    * Scale shape: each sweep is one degree partial-agg + two semi-joins
    * against the shrinking survivor set, checkpointed so sweep t+1 reads
    * sweep t's materialized edges — per-sweep cost is monotone
    * decreasing in the edge set, the property that makes peeling cheap
    * at 100 TB. The oracle unrolls the identical sweeps CTE-for-CTE.
    */
  val kcorePeel: GraftQuery = GraftQuery(
    "dedup_kcore_peel",
    s"$KcoreK-core peeling curve over the J >= $ClusterJaccard graph: per-sweep nodes/edges + fixpoint attestation",
    DedupOracle.kcorePeelSql) { (s, d) =>
    val pairs = sharedNgramPairs(s, d)
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    var bi = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    graft.api.Checkpoints.release(pairs)
    def counts(t: Int, edges: DataFrame) = edges.agg(
      count_distinct(col("src")).as("n_nodes"),
      count(lit(1)).as("n_edges"))
      .select(lit(t).as("sweep"), col("n_nodes"), col("n_edges"))
    val curve = scala.collection.mutable.ArrayBuffer(counts(0, bi))
    for (t <- 1 to KcoreSweeps) {
      val surv = bi.groupBy(col("src")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= KcoreK).select(col("src").as("node"))
      // every sweep's checkpoint must stay alive: the curve frames read
      // them when the FINAL union materializes (the sweep-local release
      // pattern of pagerankFrame doesn't apply — there only the last
      // sweep survives into the result)
      bi = bi
        .join(surv, col("src") === col("node"), "left_semi")
        .join(surv, col("dst") === col("node"), "left_semi")
        .localCheckpoint()
      curve += counts(t, bi)
    }
    val conv = bi.groupBy(col("src")).agg(count(lit(1)).as("c"))
      .agg(coalesce(min(col("c")) >= KcoreK, lit(true)).as("converged"))
    curve.reduce(_ unionByName _)
      .crossJoin(broadcast(conv))
      .orderBy("sweep")
  }

  /** Thresholds for [[yieldCurve]] — the knob range a dedup policy
    * review actually debates.
    */
  val YieldThresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  /** DEDUP YIELD CURVE — the knob-tuning artifact behind the committed
    * J >= [[ClusterJaccard]] policy: every threshold trades corpus
    * volume against duplication, and this prices the WHOLE range in one
    * pair mine instead of five re-runs. Per threshold: LSH-verified
    * pair count, documents with at least one dup at that strength
    * (max-Jaccard per doc — computed once, thresholds nest), their
    * corpus share, and the DROP-ALL-policy yield (remove every
    * dup-involved doc — the conservative floor; the keep-one-per-cluster
    * yield needs connected components and belongs to the clusters
    * family at the committed threshold — this curve chooses the
    * threshold, the keeper executes it).
    *
    * Scale shape: ONE banded pair mine (the LSH chain's own bounded
    * cost), one per-doc max rollup, then five conditional aggregates
    * over the pair/doc frames — adding thresholds is free. Determinism:
    * counts exact; jaccard-vs-literal compares are identical doubles;
    * shares divide exact longs.
    */
  val yieldCurve: GraftQuery = GraftQuery(
    "dedup_yield_curve",
    s"dedup threshold sweep ${YieldThresholds.mkString("/")}: pairs, dup-involved docs, drop-all yield per threshold from one pair mine",
    DedupOracle.yieldCurveSql) { (s, d) =>
    yieldCurveFrame(Tables.documents(s, d))
  }

  /** The yield derivation over any documents frame — shared by the
    * registry query and the graded-pair fixture (TextDedupSpec).
    */
  def yieldCurveFrame(docs: DataFrame): DataFrame = {
    val pairs = minhashJaccardFrame(docs)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .localCheckpoint()
    val docMax = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc"),
        col("jaccard"))
      .groupBy(col("doc")).agg(max(col("jaccard")).as("maxj"))
    val eCols = YieldThresholds.zipWithIndex.map { case (t, i) =>
      sum(when(col("jaccard") >= t, 1L).otherwise(0L)).as(s"e$i")
    }
    val mCols = YieldThresholds.zipWithIndex.map { case (t, i) =>
      sum(when(col("maxj") >= t, 1L).otherwise(0L)).as(s"m$i")
    }
    val edgeAgg = pairs.agg(eCols.head, eCols.tail: _*)
    val docAgg = docMax.agg(mCols.head, mCols.tail: _*)
    val tot = docs.agg(count(lit(1)).as("n_docs"))
    val rows = YieldThresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"), col(s"e$i").as("n_pairs"),
        col(s"m$i").as("n_docs_in_dup"))
    }
    edgeAgg.crossJoin(broadcast(docAgg)).crossJoin(broadcast(tot))
      .select(col("n_docs"), inline(array(rows: _*)))
      // coalesce: an empty pair mine makes the conditional sums NULL on
      // the engine side while the twin's COALESCE reads 0
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_in_dup"), lit(0L)).as("n_docs_in_dup"),
        col("n_docs"))
      .select(col("threshold"), col("n_pairs"), col("n_docs_in_dup"),
        col("n_docs"),
        (col("n_docs_in_dup").cast("double") / col("n_docs").cast("double"))
          .as("dup_doc_share"),
        ((col("n_docs") - col("n_docs_in_dup")).cast("double")
          / col("n_docs").cast("double")).as("drop_all_yield"))
      .orderBy("threshold")
  }

  /** TRAIN/EVAL SPLIT LEAKAGE audit — the eval-hygiene composition of the
    * near-dup miner and the content-hash splitter (`doc_splits`): a
    * near-duplicate pair STRADDLING a split boundary leaks training
    * content into evaluation and quietly inflates every metric. The
    * content-hash split is immune to EXACT dups by construction (both
    * copies hash to the same bucket — identical normText, identical
    * split; the spec pins it), which is precisely why near-dups are the
    * residual risk this audit measures: per unordered split pair, the
    * LSH-verified J >= [[ClusterJaccard]] pair count, its share of all
    * dup pairs, the 1e-9-quantized mean Jaccard, and the leakage verdict
    * (split_a != split_b).
    *
    * Scale shape: the MinHash+LSH chain's own cost (band-bucket-capped —
    * never corpus-quadratic) plus a broadcast-sized split-label join and
    * a <= 6-row rollup. Determinism: pair counts exact; the split-pair
    * key is normalized with least/greatest; shares and means divide
    * exact longs.
    */
  val splitLeakage: GraftQuery = GraftQuery(
    "dedup_split_leakage",
    s"near-dup pairs straddling the content-hash train/val/test split: per split-pair counts, mean Jaccard, leakage verdict",
    DedupOracle.splitLeakageSql) { (s, d) =>
    splitLeakageFrame(Tables.documents(s, d))
  }

  /** The leakage audit over any documents frame — shared by the registry
    * query and the planted straddling-pair spec (DedupSpec).
    */
  def splitLeakageFrame(docs: DataFrame): DataFrame = {
    import graft.api.Det
    import graft.text.TextFns
    val bucket = TextFns.hash60(TextFns.normText(col("text"))) % 100
    val sp = docs.select(col("doc_id"),
      when(bucket < 80, lit("train"))
        .when(bucket < 90, lit("val"))
        .otherwise(lit("test")).as("split"))
    val pairs = minhashJaccardFrame(docs)
      .filter(col("jaccard") >= ClusterJaccard)
    val lab = pairs
      .join(broadcast(sp.select(col("doc_id").as("doc_a"),
        col("split").as("sa"))), Seq("doc_a"))
      .join(broadcast(sp.select(col("doc_id").as("doc_b"),
        col("split").as("sb"))), Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"),
        Det.quantize(col("jaccard"), 9).as("jq"))
    val g = lab.groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"),
        ((sum(col("jq")) / lit(1e9)) / count(lit(1))).as("avg_jaccard"))
      .localCheckpoint()
    val tot = g.agg(sum(col("n_pairs")).as("n_total"))
    g.crossJoin(broadcast(tot))
      .select(col("split_a"), col("split_b"), col("n_pairs"),
        (col("n_pairs").cast("double") / col("n_total").cast("double"))
          .as("pair_share"),
        col("avg_jaccard"),
        (col("split_a") =!= col("split_b")).as("is_leakage"))
      .orderBy("split_a", "split_b")
  }

  def all: Seq[GraftQuery] =
    Seq(exactSummary, ngramTopk, minhashLsh, simhashPairs, clusters,
      kcorePeel,
      clusterIncrement,
      clustersMulti, keepSummary, spanOverlap, spanStrip, longestSpan,
      paragraphPairs,
      dupSpanMass, degreeHistogram, incrementalScreen, pagerank, communities,
      bloomScreen,
      lshRecallDedup, lshTuning, sourceMatrix, triangles,
      prefixFilterPairs, keepBest,
      stageFunnel, splitLeakage, groupedSplits, yieldCurve)
}
