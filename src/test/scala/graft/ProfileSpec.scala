package graft

import graft.quality.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private def sample = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), 10.0),
    (3L, None, 30.0),
    (3L, Some("a"), 30.0)
  ).toDF("k", "s", "v")

  test("profile: one row per column with exact counts, nulls excluded from distinct/minmax") {
    val got = Profile.profile(sample, Seq("k", "s", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSet
    assert(got == Set(
      ("k", 4L, 0L, 3L, "1", "3"),
      ("s", 4L, 1L, 2L, "a", "b"),
      ("v", 4L, 0L, 2L, "10.0", "30.0")))
  }

  test("profile: an all-null column profiles as (n, n, 0, null, null)") {
    val df = sample.withColumn("z", lit(null).cast("string"))
    val row = Profile.profile(df, Seq("z")).collect().head
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == (4L, 4L, 0L))
    assert(row.isNullAt(4) && row.isNullAt(5))
  }

  test("profile: approx variant agrees exactly on small cardinalities") {
    val exact = Profile.profile(sample, Seq("k", "s"))
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    val approx = Profile.profile(sample, Seq("k", "s"), exactDistinct = false)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    // HLL++ is exact well below its sparse-mode threshold
    assert(exact == approx)
  }

  test("profile: single aggregate pass — exactly one scan of the input in the plan") {
    val plan = Profile.profile(sample, Seq("k", "s", "v")).queryExecution
      .optimizedPlan.toString
    assert(!plan.contains("Join"), s"profile must not join:\n$plan")
  }

  test("benfordAudit: exact digit histogram in ppm, zero-count digits present") {
    import spark.implicits._
    // 10.00→digit 1 (×4), 2.50→2 (×2), 999.99→9 (×1); null/non-positive dropped
    val vals: Seq[Option[Double]] = Seq(Some(10.0), Some(10.0), Some(10.0),
      Some(10.0), Some(2.5), Some(2.5), Some(999.99), None, Some(0.0), Some(-5.0))
    val df = vals.toDF("v")
    val out = Profile.benfordAudit(df, "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSeq == (1L to 9L))
    val byDigit = out.map(t => t._1 -> t._2).toMap
    assert(byDigit == Map(1L -> 4L, 2L -> 2L, 9L -> 1L) ++
      (3L to 8L).map(_ -> 0L).toMap)
    // ppm: 4/7, 2/7, 1/7 rounded
    val ppm = out.map(t => t._1 -> t._3).toMap
    assert(ppm(1L) == math.round(4.0 * 1e6 / 7.0))
    assert(ppm(2L) == math.round(2.0 * 1e6 / 7.0))
    assert(ppm(3L) == 0L)
    // law column is the driver-computed constant; dev is the difference
    for ((d, _, obs, law, dev) <- out) {
      assert(law == math.round(math.log10(1.0 + 1.0 / d) * 1e6))
      assert(dev == obs - law)
    }
  }

  test("benfordAudit: digit of an exact power of ten is 1 (no log path)") {
    import spark.implicits._
    // 1000.00 == 100000 cents: the floor(log10) formulation is exactly
    // the case that can misclassify this; the string head cannot
    val df = Seq(1000.0, 0.01, 100.0).toDF("v")
    val out = Profile.benfordAudit(df, "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(1L) == 3L)
  }

  test("profile rejects empty and unknown column lists") {
    intercept[IllegalArgumentException] { Profile.profile(sample, Seq.empty) }
    intercept[IllegalArgumentException] { Profile.profile(sample, Seq("nope")) }
  }
}
