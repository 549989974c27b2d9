package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSpec
import SimFns._

class SimSpec extends SparkSpec {

  test("dot/norm: known vectors") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      dot(col("a"), col("b")).as("d"),
      norm(col("a")).as("na")).collect()(0)
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === math.sqrt(14.0))
  }

  test("cosine of a vector with itself is exactly 1 after norm division") {
    val spark0 = spark
    import spark0.implicits._
    val v = Seq(0.25, -0.5, 0.125, 1.0) // binary-exact values
    val df = Seq((v, v)).toDF("a", "b")
    val r = df.select(
      (dot(col("a"), col("b")) / (norm(col("a")) * norm(col("b")))).as("c"))
      .collect()(0).getDouble(0)
    assert(r === 1.0)
  }

  test("lshBucket: deterministic, in range, identical vectors same bucket") {
    val spark0 = spark
    import spark0.implicits._
    val v1 = Seq.tabulate(Dims)(i => (i % 7 - 3) / 3.0)
    val v2 = Seq.tabulate(Dims)(i => (i % 5 - 2) / 2.0)
    val out = Seq(v1, v1, v2).toDF("v")
      .select(lshBucket(col("v")).as("b")).collect().map(_.getInt(0))
    assert(out(0) === out(1))
    assert(out.forall(b => b >= 0 && b < (1 << NumPlanes)))
  }

  test("planes are fixed literals (regression pin)") {
    assert(Planes.length === NumPlanes)
    assert(Planes.forall(_.length === Dims))
    assert(Planes.flatten.forall(p => p >= -1.0 && p <= 1.0))
    // pin a couple of values so accidental generator changes fail loudly
    assert(Planes(0)(0) === ((2654435761L % 2001) - 1000) / 1000.0)
  }
}
