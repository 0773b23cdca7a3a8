package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private val df = (1L to 400L).map(i => (if (i % 2 == 0) "a" else "b", i, i.toDouble))
    .toDF("g", "k", "v")

  test("distinctEnvelope holds at defaults and under a loosened rsd") {
    for (rsd <- Seq(0.01, 0.2)) {
      val out = Sketches.distinctEnvelope(df, "g", "k", rsd = rsd).collect()
      assert(out.length == 2)
      out.foreach { r =>
        assert(r.getAs[Long]("exact_distinct") == 200L)
        assert(r.getAs[Boolean]("within_env"), s"envelope failed at rsd=$rsd")
      }
    }
  }

  test("percentileEnvelope holds at defaults and at a coarse accuracy") {
    for (acc <- Seq(1000, 100)) {
      val out = Sketches.percentileEnvelope(df, "g", "v", Seq(0.5, 0.95), accuracy = acc)
        .collect()
      out.foreach { r =>
        assert(r.getAs[Boolean]("p50_in_env") && r.getAs[Boolean]("p95_in_env"),
          s"envelope failed at accuracy=$acc")
      }
    }
  }

  test("a zero-width percentile band can fail: the envelope is a real check") {
    // even-cardinality distinct values: the interpolated exact median
    // (2.5) is no element, while GK returns an element — slackRanks = 0
    // collapses the band to the interpolated point and must go false,
    // proving the boolean is wired to the sketch, not hard-coded true
    val tiny = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)).toDF("g", "v")
    val out = Sketches.percentileEnvelope(tiny, "g", "v", Seq(0.5), slackRanks = 0.0)
      .collect().head
    assert(!out.getAs[Boolean]("p50_in_env"))
  }
}
