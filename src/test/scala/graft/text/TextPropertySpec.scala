package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec
import TextFns._

/** Property-based invariants of the text primitives: scalacheck-generated
  * corpora, each property checked over the whole generated set in one
  * batched Spark pass (the LoanPropertySpec recipe).
  */
class TextPropertySpec extends SparkSpec {

  private val wordGen: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)

  private val docGen: Gen[String] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  private def docs(n: Int, seed: Long): org.apache.spark.sql.DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    Gen.listOfN(n, docGen)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
      .getOrElse(Nil)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("shingles: count is max(0, n_tokens - k + 1) and every shingle has k tokens") {
    val k = 3
    val bad = docs(400, 7L)
      .select(size(tokens(col("text"))).as("n"),
        shingles(tokens(col("text")), k).as("sh"))
      .filter(
        size(col("sh")) =!= greatest(lit(0), col("n") - (k - 1)) ||
          exists(col("sh"), s => size(split(s, " ")) =!= k))
      .count()
    assert(bad === 0L)
  }

  test("hash60: always in [0, 2^60) and equal inputs hash equal across exprs") {
    val h = docs(400, 11L).select(hash60(col("text")).as("h"),
      hash60(col("text")).as("h2"))
    val bad = h.filter(
      col("h") < 0 || col("h") >= lit(1152921504606846976L) ||
        col("h") =!= col("h2")).count()
    assert(bad === 0L)
  }

  test("fingerprint: invariant under leading/trailing/repeated whitespace and case") {
    val base = docs(200, 13L)
    val mangled = base.select(col("doc_id"),
      concat(lit("  "), upper(col("text")), lit(" \t "))
        .as("text"))
    val joined = base.select(col("doc_id"), fingerprint(col("text")).as("fa"))
      .join(mangled.select(col("doc_id"), fingerprint(col("text")).as("fb")),
        "doc_id")
    assert(joined.filter(col("fa") =!= col("fb")).count() === 0L)
  }

  test("lm perplexity frame: ppl >= 1 and n_bigrams = n_tokens - 1 on multi-token docs") {
    val d = docs(300, 17L)
    val toks = d.select(col("doc_id"), size(tokens(col("text"))).as("n"))
      .filter(col("n") >= 2)
    val lm = TextQueries.lmPerplexityFrame(d)
    // every scored bigram was seen in training, so p <= 1 per bigram and
    // ppl = exp(mean -ln p) >= 1; docs with < 2 tokens must be absent
    val joined = lm.join(toks, "doc_id")
    assert(lm.count() === toks.count())
    assert(joined.filter(
      col("ppl") < 1.0 || col("n_bigrams") =!= col("n") - 1).count() === 0L)
  }

  test("epoch shards: deterministic per epoch, decorrelated between epochs") {
    val d = graft.Tables.documents(spark, sf)
    def shardCol(epoch: Int) =
      (hash60(concat(lit(epoch.toString), lit(":"), col("text")))
        % TextQueries.ShardCount).as(s"s$epoch")
    val both = d.select(col("doc_id"), shardCol(0), shardCol(1))
    val n = both.count()
    // same epoch, re-run -> identical assignment (content hash, no RNG)
    val again = d.select(col("doc_id"), shardCol(0).as("s0b"))
    assert(both.join(again, "doc_id")
      .filter(col("s0") =!= col("s0b")).count() === 0L)
    // across epochs the assignment decorrelates: same-shard carryover is
    // ~1/ShardCount, emphatically NOT 1 (a 3x band absorbs small-sample
    // noise at sf0.001 while still distinguishing 1/8 from 1)
    val carry = both.filter(col("s0") === col("s1")).count()
    val expected = n.toDouble / TextQueries.ShardCount
    assert(carry < 3 * expected, s"carryover $carry vs expected ~$expected")
    assert(carry > 0)
  }
}
