package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Chunk-grain retrieval contract: the materialized chunk rows carry
  * exactly the token mass the closed-form `corpus_chunking` audit
  * charges, and chunk-grain BM25 surfaces a relevant passage buried
  * mid-document that doc-grain BM25 length-normalizes below a short
  * competitor — the inversion that motivates indexing at chunk grain.
  */
class ChunkSpec extends SparkSpec {

  private def docsOf(rows: Seq[(Long, String)]) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("doc_id", "text")
  }

  // doc 0: a 960-token document with the full query passage (each term
  // twice) buried at token positions 150-159; doc 1: a 3-token doc
  // hitting 3 of the 5 query terms once; docs 2-11: pure filler (they
  // hold avgdl down so doc 0's length actually penalizes it).
  private lazy val fixture = {
    val passage = Seq("dup", "spark", "hash", "stream", "sort",
      "dup", "spark", "hash", "stream", "sort")
    val doc0 = (Seq.fill(150)("filler") ++ passage ++
      Seq.fill(800)("filler")).mkString(" ")
    docsOf(Seq(
      0L -> doc0,
      1L -> "dup spark hash") ++
      (2L to 11L).map(_ -> Seq.fill(50)("filler").mkString(" ")))
  }

  test("chunk rows: token mass equals the closed-form chunking audit") {
    val (c, s) = (TextQueries.ChunkSize, TextQueries.ChunkStride)
    val lens = fixture.select(size(TextFns.tokens(col("text"))).cast("long"))
      .collect().map(_.getLong(0))
    def kOf(n: Long) = if (n <= c) 1L else (n - c + s - 1) / s + 1
    val expectChunks = lens.map(kOf).sum
    val expectMass = lens.map { n =>
      if (n <= c) n else c * (kOf(n) - 1) + n - s * (kOf(n) - 1)
    }.sum
    val rows = TextQueries.chunkRowsFrame(fixture)
      .agg(count(lit(1)), sum(col("cl"))).collect()(0)
    assert(rows.getLong(0) === expectChunks)
    assert(rows.getLong(1) === expectMass)
    // every non-final chunk is exactly ChunkSize tokens and starts at
    // chunk_id * stride — the index geometry an embedder relies on
    val bad = TextQueries.chunkRowsFrame(fixture)
      .groupBy(col("doc_id"))
      .agg(max(col("chunk_id")).as("last"), count(lit(1)).as("k"))
      .collect()
    bad.foreach(r => assert(r.getAs[Long]("last") === r.getAs[Long]("k") - 1))
  }

  test("buried passage: diluted at doc grain, top-1 at chunk grain") {
    val docTop = TextQueries.bm25Frame(fixture).collect()
    // doc grain: the short 3-term doc outranks the long doc whose
    // passage is length-normalized away
    assert(docTop.head.getAs[Long]("doc_id") === 1L,
      s"expected doc 1 on top at doc grain: ${docTop.toSeq}")
    val chunkTop = TextQueries.chunkBm25Frame(fixture).collect()
    // chunk grain: the passage's own window (chunk 1 covers tokens
    // 96-223, containing the passage at 150-159) wins outright with
    // all 5 terms hit
    assert(chunkTop.head.getAs[Long]("doc_id") === 0L &&
      chunkTop.head.getAs[Long]("chunk_id") === 1L,
      s"expected (doc 0, chunk 1) on top at chunk grain: ${chunkTop.toSeq}")
    assert(chunkTop.head.getAs[Long]("terms_hit") === 5L)
    // the passage appears in exactly one chunk of doc 0 (the stride-96
    // windows around it don't reach positions 150-159)
    assert(chunkTop.count(r => r.getAs[Long]("doc_id") == 0L &&
      r.getAs[Long]("terms_hit") == 5L) === 1)
  }
}
