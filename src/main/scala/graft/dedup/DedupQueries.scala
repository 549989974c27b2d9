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

  /** Distinct word-n-gram shingles per doc: (doc_id, sh). Takes any
    * (doc_id, text) frame so fixture corpora can drive the pipeline in
    * tests.
    */
  def shingleSet(docs: DataFrame, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      explode(array_distinct(shingles(tokens(col("text")), n))).as("sh"))
  }

  /** Exact dedup summary: fingerprint = md5(normalized text); the kept set
    * is one doc per fingerprint. (The corpus has no exact dups — the zero
    * is the assertion.) At scale this is one partial-aggregated groupBy on
    * a 16-byte key.
    */
  val exactSummary: GraftQuery = GraftQuery(
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
    ngramTopkFrame(Tables.documents(s, d))
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
    import org.apache.spark.sql.expressions.Window
    // Evaluate `extra` in a SEPARATE select BELOW the explode. Putting them
    // in the same select as the generator looks equivalent but is not:
    // ExtractGenerator keeps non-generator expressions in the Project ABOVE
    // the Generate, re-evaluating a per-DOCUMENT expression once per
    // POSTING row — measured 2x on the split-tagged build (the tag is an
    // md5 over the normalized text, and each doc explodes to ~300 rows).
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val pre = docs.select(col("doc_id") +: col("text") +: extra: _*)
    val keep = pre.columns.filterNot(_ == "text").map(col)
    pre.select(keep :+
        explode(array_distinct(shingles(tokens(col("text")), n))).as("sh"): _*)
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

  /** Top-20 presentation slice of [[ngramJaccardFrame]]. */
  def ngramTopkFrame(docs: DataFrame): DataFrame =
    ngramJaccardFrame(docs)
      .orderBy(desc("jaccard"), col("doc_a"), col("doc_b"))
      .limit(20)

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
  private[graft] def bandKeys(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until MinhashK / BandRows).map { b =>
      val key = md5(concat_ws(":",
        (0 until BandRows).map(r => col(s"s${b * BandRows + r}")): _*))
      struct(lit(b).as("b"), key.as("bk"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.bk").as("bk"))
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
  def minhashLshFrame(docs: DataFrame): DataFrame = {
    val sh = shingleSet(docs, MinhashShingleN).localCheckpoint()
    val sigs = minhashSigs(sh)
    val bands = bandKeys(sigs)
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sizes = sigs.select(col("doc_id"), col("n"))
    val inter = cand
      .join(sh.as("xa"), col("doc_a") === col("xa.doc_id"))
      .join(sh.as("xb"), col("doc_b") === col("xb.doc_id") && col("xa.sh") === col("xb.sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("i") / (col("sa.n") + col("sb.n") - col("i"))).as("jaccard"))
      .orderBy(desc("jaccard"), col("doc_a"), col("doc_b"))
      .limit(20)
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
    // the fingerprint frame is one row per doc but costs the full
    // explode + two-exchange aggregation — materialize it ONCE before it
    // fans out to both sides of the band self-join (same discipline as
    // cappedPostings; the caller's releaseAll frees the blocks)
    val fp = graft.text.TextQueries.simhashFrame(s, d).localCheckpoint()
    val bandMask = (1L << SimhashBandBits) - 1
    val bandStructs = (0 until SimhashBands).map { b =>
      struct(lit(b).as("b"),
        shiftright(col("simhash"), b * SimhashBandBits)
          .bitwiseAND(lit(bandMask)).as("bk"))
    }
    val bands = fp.select(col("doc_id"), col("simhash"),
      explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("simhash"), col("band.b").as("b"), col("band.bk").as("bk"))
    bands.as("x")
      .join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= SimhashHammingMax)
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Sweep cap for [[connectedComponents]]. Sweeps = max component
    * diameter, and a J >= 0.5 near-dup edge set is near-transitive —
    * clusters are pairs / triples / small stars, diameter 2-3 at any
    * corpus size. The cap is 4x headroom over that; an input whose
    * components are deeper (an adversarial similarity CHAIN, where each
    * link is similar but the ends are not) fails FAST with a diagnosis
    * instead of grinding out O(diameter) shuffles — the point where a
    * pipeline should switch to the O(log n)-round large-star/small-star
    * algorithm rather than let this one run unbounded.
    */
  val MaxCcSweeps = 12

  /** Connected components by minimum-label propagation over an (a, b)
    * edge list: every node starts as its own label and repeatedly takes
    * the min label of itself and its neighbors until a sweep changes
    * nothing. Each sweep is ONE shuffle (join edges->labels on the
    * neighbor + partial-aggregated min per node) and ONE local pass for
    * the convergence check: the sweep's checkpointed output carries the
    * pre-sweep label, so `changed` is a filter+count over the blocks just
    * materialized — no extra join job. `localCheckpoint` truncates the
    * lineage between sweeps; the superseded sweep's blocks are unpersisted
    * the moment its successor is materialized (and `sym`'s at
    * convergence), so peak block storage is TWO sweeps regardless of
    * iteration count. The driver only ever sees the changed COUNT —
    * iteration control, never data. Bounded by [[MaxCcSweeps]].
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val fwd = edges.select(col("a"), col("b"))
    val sym = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
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
      require(sweeps <= MaxCcSweeps,
        s"connectedComponents: no convergence after $MaxCcSweeps sweeps — " +
          "component diameter exceeds the near-dup assumption (J >= " +
          s"$ClusterJaccard edges are near-transitive); use a star-contraction " +
          "algorithm for deep components")
      val nbrMin = sym
        .join(labels.select(col("node").as("nbr"), col("label").as("nl")),
          col("b") === col("nbr"))
        .groupBy(col("a").as("node"))
        .agg(min(col("nl")).as("nl"))
      // carry the pre-sweep label through the checkpoint: the convergence
      // check is then a scan of the materialized blocks, not a join job
      val next = labels
        .join(nbrMin.select(col("node").as("node2"), col("nl")),
          col("node") === col("node2"), "left")
        .select(col("node"), col("label").as("prev"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint()
      changed = next.filter(col("label") < col("prev")).count()
      graft.api.Checkpoints.release(labels)
      labels = next.select(col("node"), col("label"))
    }
    graft.api.Checkpoints.release(sym)
    labels
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
    val edges = ngramJaccardFrame(Tables.documents(s, d))
      .filter(col("jaccard") >= ClusterJaccard)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    connectedComponents(edges)
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
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
    val edges = ngramJaccardFrame(docs)
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
    val edges = ngramJaccardFrame(docs)
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

  def all: Seq[GraftQuery] =
    Seq(exactSummary, ngramTopk, minhashLsh, simhashPairs, clusters,
      keepSummary, spanOverlap, degreeHistogram)
}
