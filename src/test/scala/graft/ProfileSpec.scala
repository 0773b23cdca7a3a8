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

  test("profile rejects empty and unknown column lists") {
    intercept[IllegalArgumentException] { Profile.profile(sample, Seq.empty) }
    intercept[IllegalArgumentException] { Profile.profile(sample, Seq("nope")) }
  }
}
