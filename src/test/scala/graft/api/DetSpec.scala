package graft.api

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The determinism contract itself: quantized sums must be bit-identical
  * at ANY partition count (the property that makes results reproducible on
  * a 1000-executor cluster and hash-matchable against a single-threaded
  * oracle), and date arithmetic must clamp like the reference's pandas
  * DateOffset.
  */
class DetSpec extends SparkSpec {

  test("sumQ is invariant under repartitioning; naive double sum is not guaranteed") {
    val spark0 = spark
    import spark0.implicits._
    // values chosen to have long binary tails so naive summation order matters
    val vals = (1 to 20000).map(i => math.Pi * i / 7.0 + 1.0 / i)
    val base = vals.toDF("v")
    val results = Seq(1, 3, 13, 32).map { p =>
      base.repartition(p).agg(Det.sumQ(col("v")).as("s")).collect()(0).getDouble(0)
    }
    assert(results.distinct.size === 1,
      s"sumQ must not depend on partitioning: $results")
  }

  test("quantize: half-up at representable boundaries, negative values toward +inf") {
    val spark0 = spark
    import spark0.implicits._
    val out = Seq(1.00005, 1.00004, -1.00005, 0.0, 2.5)
      .toDF("v").select(Det.quantize(col("v"), 4).as("q"))
      .collect().map(_.getLong(0))
    // floor(x*1e4 + 0.5): the exact doubles nearest these literals decide
    // the result — recompute with the same IEEE754 ops
    val expect = Seq(1.00005, 1.00004, -1.00005, 0.0, 2.5)
      .map(v => math.floor(v * 1e4 + 0.5).toLong)
    assert(out.toSeq === expect)
  }

  test("add_months clamps end-of-month like pandas DateOffset (G1 parity)") {
    val spark0 = spark
    import spark0.implicits._
    val out = Seq(("2024-01-31", 1), ("2024-01-31", 13), ("2023-11-30", 3))
      .toDF("d", "m")
      .select(add_months(to_date(col("d")), col("m")).cast("string").as("r"))
      .collect().map(_.getString(0))
    // pandas: 2024-01-31 + 1mo = 2024-02-29 (leap), +13mo = 2025-02-28,
    // 2023-11-30 + 3mo = 2024-02-29
    assert(out.toSeq === Seq("2024-02-29", "2025-02-28", "2024-02-29"))
  }
}
