package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import TextFns._

/** Unit tests for the text primitives and the dedup candidate machinery on
  * literal fixtures.
  */
class TextDedupSpec extends SparkSpec {

  test("shingles: counts, contents, and short-doc empty array") {
    val spark0 = spark
    import spark0.implicits._
    val out = Seq("a b c d", "a b", "a").toDF("text")
      .select(shingles(tokens(col("text")), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(out(0).toSeq === Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
    assert(out(2).isEmpty)
  }

  test("normText/fingerprint: whitespace+case normalization collapses dups") {
    val spark0 = spark
    import spark0.implicits._
    val fps = Seq("Hello  World", "hello world", "  hello   world  ")
      .toDF("text").select(fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps.distinct.length === 1)
  }

  test("langPred: marker argmax with dictionary-order tie-break") {
    val spark0 = spark
    import spark0.implicits._
    val out = Seq(
      "the cat of the house", // en markers x3
      "le chat et le chien", // fr markers x3
      "no markers here whatsoever") // tie at 0 -> first language (en)
      .toDF("text").select(langPred(tokens(col("text"))).as("l"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("en", "fr", "en"))
  }

  test("hash60: deterministic, non-negative, distinct inputs differ") {
    val spark0 = spark
    import spark0.implicits._
    val h = Seq("alpha", "alpha", "beta").toDF("t")
      .select(hash60(col("t")).as("h")).collect().map(_.getLong(0))
    assert(h(0) === h(1))
    assert(h(0) !== h(2))
    assert(h.forall(_ >= 0L))
  }

  test("minhash property: identical shingle sets share every band hash") {
    val spark0 = spark
    import spark0.implicits._
    // two identical docs + one different; identical docs must produce
    // identical min-md5 signatures for every seed
    val sh = Seq(
      (0L, "x y"), (0L, "y z"), (1L, "x y"), (1L, "y z"), (2L, "q r"))
      .toDF("doc_id", "sh")
    val sigs = (0 until 4).map(i =>
      min(md5(concat(lit(s"$i:"), col("sh")))).as(s"s$i"))
    val out = sh.groupBy("doc_id").agg(sigs.head, sigs.tail: _*)
      .orderBy("doc_id").collect()
    (1 to 4).foreach(i => assert(out(0).getString(i) === out(1).getString(i)))
    assert((1 to 4).exists(i => out(0).getString(i) !== out(2).getString(i)))
  }
}
