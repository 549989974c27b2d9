package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Fixture-driven audit of [[MultimodalQueries.crossmodalFrame]]: plant one
  * orphan on each side of the doc/vector join and one text-duplicate pair
  * whose vectors are orthogonal, and watch each violation surface in its
  * own (check, lang) row — the contract the clean-corpus zeros attest.
  */
class CrossModalSpec extends SparkSpec {

  private def fixture() = {
    import spark.implicits._
    // docs 1/2: near-identical texts (3-gram Jaccard 5/7 >= 0.5), lang en.
    // doc 4 (fr) has NO vector; vec 99 has NO doc.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en"),
      (2L, "alpha beta gamma delta epsilon zeta eta omega", "en"),
      (3L, "one two three four five six seven eight", "de"),
      (4L, "lone orphan document words with no vector here", "fr")
    ).toDF("doc_id", "text", "lang")
    def unit(hot: Int): Seq[Float] =
      (0 until graft.sim.SimFns.Dims).map(i => if (i == hot) 1.0f else 0.0f)
    // vecs 1 and 2 orthogonal (cosine 0 < CrossModalCosine) — text says
    // duplicate, vectors say strangers
    val embs = Seq(
      (1L, unit(0)), (2L, unit(1)), (3L, unit(2)), (99L, unit(3))
    ).toDF("vec_id", "embedding")
    (docs, embs)
  }

  test("planted violations surface as audit rows") {
    val (docs, embs) = fixture()
    val out = MultimodalQueries.crossmodalFrame(docs, embs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("doc_total", "en")) === 2L)
    assert(out(("doc_total", "de")) === 1L)
    assert(out(("doc_total", "fr")) === 1L)
    assert(out(("doc_no_vec", "fr")) === 1L)
    assert(out(("vec_no_doc", "(none)")) === 1L)
    assert(out(("dup_pair", "en")) === 1L)
    assert(out(("dup_pair_disagree", "en")) === 1L)
    // nothing else leaked into the orphan/dup groups
    assert(!out.contains(("doc_no_vec", "en")))
    assert(!out.contains(("dup_pair", "de")))
  }

  test("text_to_asset: the planted matching asset wins rank 1 with hit=true") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val q = MultimodalQueries.XmodalQuery // 26 bytes
    // doc 7: width 64 (7 % 7 = 0), 64 x 13 = 832 decoded pixels = EXACTLY
    // 32 concatenated query copies — the asset's byte-class histogram
    // equals the query's, so cosine is exactly 1.0 and the LSH bucket is
    // the query's own. Decoys: digits-only (disjoint byte classes) and a
    // single-letter run (one shared class).
    val docs = Seq(
      (7L, q * 32, "web"),
      (14L, "0123456789" * 90, "web"),
      (21L, "t" * 900, "web")
    ).toDF("doc_id", "text", "source")
    val out = MultimodalQueries.textToAssetFrame(
      MultimodalQueries.mediaFrame(docs)).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getInt(0) === 1, "rank 1 missing")
    assert(top.getLong(1) === 7L, "wrong asset won")
    assert(top.getDouble(3) === 1.0, "exact-histogram cosine must be 1.0")
    assert(top.getBoolean(4), "rank-1 asset must be an exact-truth hit")
    // served ranks are contiguous and scores non-increasing
    assert(out.map(_.getInt(0)).toSeq === (1 to out.length))
    assert(out.map(_.getDouble(3)).toSeq.sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("spectral: a planted pure bin-2 tone concentrates the DFT power there") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val W = MultimodalQueries.ThumbWidth
    // 32-sample tone at frequency 2, each sample DOUBLED so the 64-pixel
    // asset's 2:1 box resample reproduces the tone exactly (integer
    // pairs average exactly); doc_id 7 -> width 64, media_type audio
    val tone = (0 until W).map(j =>
      (64 + math.round(40 * math.cos(2.0 * math.Pi * 2 * j / W))).toInt)
    val text = tone.flatMap(v => Seq(v, v)).map(_.toChar).mkString
    val docs = Seq((7L, text, "web")).toDF("doc_id", "text", "source")
    val out = MultimodalQueries.spectralFrame(
      MultimodalQueries.mediaFrame(docs)).collect()
    assert(out.length === 1)
    val r = out.head
    val ps = (1 to 4).map(k => r.getDouble(k))
    assert(r.getAs[Int]("dominant_bin") === 2,
      s"tone not detected at bin 2: $ps")
    assert(ps(1) > 10 * (ps(0) max ps(2) max ps(3)),
      s"bin-2 power not dominant: $ps")
  }

  test("audio segments: planted silence/burst pattern yields exactly the two bursts") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val fl = MultimodalQueries.VadFrameLen
    // 8 frames of 16 samples (doc 7 -> audio, width 64, 128 bytes = 2
    // rows): silence = 127 (energy 1/sample), burst = 28 (energy 1e4).
    // Pattern s s L L s L L s -> segments {2,3} and {5,6}. ASCII-only
    // samples keep the text->byte identity the media derivation pins.
    val pattern = Seq(false, false, true, true, false, true, true, false)
    val text = pattern.flatMap { loud =>
      Seq.fill(fl)(if (loud) 28.toChar else 127.toChar)
    }.mkString
    val docs = Seq((7L, text, "web")).toDF("doc_id", "text", "source")
    val out = MultimodalQueries.audioSegmentsFrame(
      MultimodalQueries.mediaFrame(docs)
        .filter(org.apache.spark.sql.functions.col("media_type") === "audio"))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
      r.getLong(5)) === ((8L, 4L, 0.5, 2L, 2L)),
      s"segmentation drifted: ${r.toSeq}")
  }

  test("healthy corpus: only doc_total rows plus the always-present zero") {
    val (docs, embs) = fixture()
    val healthyDocs = docs.filter(col("doc_id") =!= 2L && col("doc_id") =!= 4L)
    val healthyEmbs = embs.filter(col("vec_id") =!= 2L && col("vec_id") =!= 99L)
    val out = MultimodalQueries.crossmodalFrame(healthyDocs, healthyEmbs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("vec_no_doc", "(none)")) === 0L)
    assert(out.keys.forall { case (check, _) =>
      check == "doc_total" || check == "vec_no_doc"
    })
  }

  test("blurFrame: flat image is maximally blurry (var 0); stripe pattern scores exactly 2500") {
    val spark0 = spark
    import spark0.implicits._
    // doc_id 0 -> image, width 64; doc_id 6 -> image, width 70
    val flat = "a" * 256                  // 64x4, every Laplacian 0
    val stripes = "az" * 175              // 70x5, columns alternate +-25
    val docs = Seq((0L, flat, "s"), (6L, stripes, "s"))
      .toDF("doc_id", "text", "source")
    val out = MultimodalQueries.blurFrame(
        MultimodalQueries.mediaFrame(docs)).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out.keySet === Set(0L, 6L))
    // flat: interior (64-2)x(4-2) = 124 Laplacians, all zero
    assert(out(0L) === ((64, 4, 124L, 0.0, true)))
    // stripes: every interior Laplacian is 4p - 2p - 2q = +-2*25 = +-50;
    // interior columns split evenly so the mean is 0 and var = 50^2
    assert(out(6L) === ((70, 5, 204L, 2500.0, false)))
  }
}
