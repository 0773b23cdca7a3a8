package graft

import org.apache.spark.sql.functions._

/** The q77 exact-moment formulas must agree with Spark's streaming
  * built-ins to within float noise — validating the algebra, while the
  * exact-sum form keeps the cross-engine gate bit-stable. */
class StatsFamilySpec extends SparkTestBase {

  test("moment-formula stats match the built-in aggregates numerically") {
    val df = SparkEntry.queries("q77_stats_family")(spark, "/root/testdata/sf0.001")
    val builtIn = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_returnflag"),
        (round(col("l_quantity") * 100, 0).cast("long")).cast("double").as("x"),
        (round(col("l_extendedprice") * 100, 0).cast("long")).cast("double").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(avg(col("x")).as("mean_x"), var_samp(col("x")).as("var_x"),
        stddev_samp(col("x")).as("std_x"), covar_samp(col("x"), col("y")).as("covar_xy"),
        corr(col("x"), col("y")).as("corr_xy"))
      .collect().map(r => r.getString(0) -> r).toMap
    val got = df.collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val b = builtIn(r.getString(0))
      for (c <- Seq("mean_x", "var_x", "std_x", "covar_xy", "corr_xy")) {
        val x = r.getAs[Double](c)
        val y = b.getAs[Double](c)
        assert(math.abs(x - y) <= 1e-6 * math.max(1.0, math.abs(y)),
          s"${r.getString(0)}.$c: $x vs built-in $y")
      }
    }
  }
}
