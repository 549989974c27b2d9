package graft.dedup

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The spark-mllib route for MinHash dedup (SURVEY.md §4.3: "built-ins
  * first" — `MinHashLSH` ships in /opt/spark/jars): tokenize -> HashingTF
  * sparse vectors -> fitted MinHash model -> approxSimilarityJoin. The
  * hand-rolled SQL MinHash in [[DedupQueries]] stays the oracle-checkable
  * surface; this spec proves the mllib path agrees on a planted duplicate.
  */
class MllibLshSpec extends SparkSpec {

  test("mllib MinHashLSH finds the planted near-duplicate pair") {
    val spark0 = spark
    import spark0.implicits._
    val base = "spark scan join filter window batch stream column row value"
    val docs = Seq(
      (0L, base),
      (1L, base + " extra"),
      (2L, "entirely different vocabulary with zero overlapping words here"))
      .toDF("doc_id", "text")
      .withColumn("tokens", split(col("text"), " "))

    val tf = new HashingTF()
      .setInputCol("tokens").setOutputCol("features").setNumFeatures(1 << 18)
    val featured = tf.transform(docs)
      // MinHashLSH requires at least one non-zero entry; all docs qualify
      .filter(udf((v: SparseVector) => v.numNonzeros > 0).apply(col("features")))

    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(featured)
    val pairs = model
      .approxSimilarityJoin(featured, featured, 0.5, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("a"),
        col("datasetB.doc_id").as("b"),
        col("jaccard_dist"))
      .filter(col("a") < col("b"))
      .collect()

    // docs 0/1 share 10 of 11 tokens (J = 10/11, dist ~ 0.09) -> must pair;
    // doc 2 shares nothing -> must not pair with anyone under dist 0.5
    assert(pairs.exists(r => r.getLong(0) === 0L && r.getLong(1) === 1L))
    assert(!pairs.exists(r => r.getLong(1) === 2L || r.getLong(0) === 2L))
  }
}
