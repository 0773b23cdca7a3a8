package graft

import org.apache.spark.sql.functions._
import graft.text.Splits

class SplitsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = (1L to 2000L).map(i => (i, s"src${i % 7}")).toDF("doc_id", "source")

  test("assignment is deterministic across invocations and repartitionings") {
    val a = Splits.assign(docs, "doc_id").select("doc_id", "split").collect().toSet
    val b = Splits.assign(docs.repartition(13), "doc_id")
      .select("doc_id", "split").collect().toSet
    assert(a == b)
  }

  test("fractions land near their weights and cover every row") {
    val counts = Splits.assign(docs, "doc_id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1450 && counts("train") < 1750)
    assert(counts("val") > 100 && counts("val") < 320)
    assert(counts("test") > 100 && counts("test") < 320)
  }

  test("group-keyed splits keep every row of a group in one split") {
    val assigned = Splits.assign(docs, "source")
    val perGroup = assigned.groupBy("source")
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L))
  }

  test("sampleByKey is a subset-stable deterministic filter") {
    val s10 = Splits.sampleByKey(docs, "doc_id", 0.1).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val s30 = Splits.sampleByKey(docs, "doc_id", 0.3).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(s10.subsetOf(s30), "smaller rate must be a subset of the larger")
    assert(s10.size > 120 && s10.size < 280)
  }

  test("sampleStratified applies per-stratum rates and drops unknown strata") {
    val d = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "zzz"))
      .toDF("doc_id", "source")
    val kept = Splits.sampleStratified(d, "source", "doc_id", Map("a" -> 0.5))
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("zzz"))
    assert(kept("a") > 170 && kept("a") < 330)
  }

  test("sampleTemperatureHalf keeps the largest stratum whole and upweights small ones") {
    // 800 "en" vs 200 "zh": proportional sampling keeps zh at 25% of en;
    // α=0.5 keeps en at rate 1.0 and zh at sqrt(200/800) = 0.5
    val d = (1L to 1000L).map(i => (i, if (i <= 800) "en" else "zh"))
      .toDF("doc_id", "lang")
    val kept = Splits.sampleTemperatureHalf(d, "lang", "doc_id")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") == 800L, s"largest stratum must sample at 1.0, got $kept")
    assert(kept("zh") > 60 && kept("zh") < 140, s"zh should land near 100, got $kept")
  }

  test("packByBudget fills packs to the budget with ≤ one-doc overshoot") {
    val d = (1L to 300L).map(i => (i, 10L + i % 40)).toDF("doc_id", "n_chars")
    val packed = Splits.packByBudget(d, "doc_id", "n_chars", budget = 200, buckets = 4)
    val perPack = packed.groupBy("pack_bucket", "pack_id")
      .agg(sum(col("n_chars")).as("w"), max(col("n_chars")).as("mx"),
        count(lit(1)).as("n"))
      .collect()
    // every pack except possibly a bucket's last holds ≥ budget − max(doc)
    // and overshoots by < its largest doc
    perPack.foreach { r =>
      assert(r.getLong(2) < 200 + r.getLong(3),
        s"pack exceeded budget by a full doc: $r")
    }
    assert(packed.select("doc_id").distinct().count() == 300)
  }

  test("existing assignments are stable when the corpus grows") {
    val before = Splits.assign(docs, "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = (1L to 4000L).map(i => (i, "s")).toDF("doc_id", "source")
    val after = Splits.assign(grown, "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before.forall { case (id, s) => after(id) == s })
  }

  test("exemplars == brute-force (bucket, key) rank per group; WindowGroupLimit engages") {
    val rows = (1L to 40L).map(i => (i, if (i % 3 == 0) "a" else "b"))
    val df = rows.toDF("doc_id", "grp")
    val out = Splits.exemplars(df, Seq("grp"), "doc_id", k = 2)
    // brute force: per group, sort by (bucket, key), take 2
    def bucket(k: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.substring(0, 8), 16) % 10000
    }
    val want = rows.groupBy(_._2).toSeq.flatMap { case (g, xs) =>
      xs.map(_._1).sortBy(id => (bucket(id), id)).take(2).zipWithIndex
        .map { case (id, i) => (id, g, i + 1) }
    }.sortBy(t => (t._2, t._3))
    val got = out.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSeq.sortBy(t => (t._2, t._3))
    assert(got == want)
    // the rank-<=k filter must take the partial-top-k path: a
    // WindowGroupLimit below the exchange, not whole groups shuffling
    assert(executedPlanNodes(out).exists(
      _.getClass.getSimpleName.contains("WindowGroupLimit")),
      "expected WindowGroupLimitExec in the exemplars plan")
    intercept[IllegalArgumentException](Splits.exemplars(df, Seq.empty, "doc_id", 1))
    intercept[IllegalArgumentException](Splits.exemplars(df, Seq("grp"), "doc_id", 0))
  }

  test("rebalanceMixture: bucket-thresholded brute force; shares honored; rejection") {
    def bucket(k: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.substring(0, 8), 16) % 10000
    }
    // unequal source sizes so the scale binds on one of them
    val rows = (1L to 60L).map(i =>
      (i, if (i <= 30) "s0" else if (i <= 50) "s1" else "s2"))
    val df = rows.toDF("doc_id", "source")
    val targets = Seq("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2)
    val kept = Splits.rebalanceMixture(df, "source", "doc_id", targets)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // brute-force replay of the threshold chain
    val counts = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val scale = targets.map { case (c, w) => counts(c).toDouble / w }.min
    val want = targets.flatMap { case (c, w) =>
      val thr = math.floor(math.floor(scale * w) / counts(c) * 10000 + 0.5).toLong
      rows.filter(r => r._2 == c && bucket(r._1) < thr)
    }.sortBy(_._1)
    assert(kept.sortBy(_._1) == want)
    // scale binds on s2 (10 rows / 0.2 = 50): desired = (25, 15, 10);
    // bucket-approximate counts stay within 20% of desired here
    val byCat = kept.groupBy(_._2).map { case (k, v) => k -> v.size }
    assert(byCat.keySet == Set("s0", "s1", "s2"))
    // absent target category must fail loudly, not renormalize
    val e = intercept[IllegalArgumentException](
      Splits.rebalanceMixture(df, "source", "doc_id", Seq("s0" -> 0.5, "nope" -> 0.5)))
    assert(e.getMessage.contains("unsatisfiable"))
    intercept[IllegalArgumentException](
      Splits.rebalanceMixture(df, "source", "doc_id", Seq("s0" -> 0.6, "s1" -> 0.6)))
  }

  test("assignLeakProof: same-cluster docs share a split; unclustered use own key") {
    val docs = (1L to 30L).map(Tuple1(_)).toDF("doc_id")
    // three clusters with min-label representatives, rest unclustered
    val clusters = Seq((1L, 1L), (7L, 1L), (19L, 1L), (4L, 4L), (28L, 4L),
      (11L, 11L), (12L, 11L)).toDF("doc_id", "cluster_id")
    val out = Splits.assignLeakProof(docs, "doc_id", clusters)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out.size == 30)
    val byDoc = out.map(t => t._1 -> (t._2, t._3)).toMap
    // same cluster => same split_key AND same split
    assert(Set(byDoc(1L), byDoc(7L), byDoc(19L)).size == 1)
    assert(Set(byDoc(4L), byDoc(28L)).size == 1)
    assert(Set(byDoc(11L), byDoc(12L)).size == 1)
    // unclustered docs: split_key == own id, split == plain assign
    val plain = Splits.assign(docs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    out.filter(t => !Set(1L, 7L, 19L, 4L, 28L, 11L, 12L).contains(t._1))
      .foreach { case (id, key, split) =>
        assert(key == id && split == plain(id), s"doc $id")
      }
    // clustered doc takes the REPRESENTATIVE's split, not its own
    assert(byDoc(7L)._2 == plain(1L) && byDoc(19L)._2 == plain(1L))
  }

  test("temporalEmbargoSplit: trailing holdout, excluded gap, boundary dates exact") {
    val rows = (1 to 100).map(i => (i.toLong, java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString)))
    val out = Splits.temporalEmbargoSplit(
        rows.toDF("id", "d"), "d", holdoutDays = 10, embargoDays = 5)
      .select("id", "split").as[(Long, String)].collect().toMap
    // max = day 100; test: days 91..100; embargo: 86..90; train: <= 85
    (1L to 85L).foreach(i => assert(out(i) == "train", s"day $i"))
    (86L to 90L).foreach(i => assert(out(i) == "embargo", s"day $i"))
    (91L to 100L).foreach(i => assert(out(i) == "test", s"day $i"))
    // zero embargo: the gap label disappears entirely
    val noGap = Splits.temporalEmbargoSplit(
        rows.toDF("id", "d"), "d", holdoutDays = 10, embargoDays = 0)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(noGap == Map("train" -> 90L, "test" -> 10L))
    // null dates fail loudly; arguments validated
    val withNull = (rows.map { case (i, d) => (i, Option(d)) } :+
      ((101L, None: Option[java.sql.Date]))).toDF("id", "d")
    val e = intercept[Exception](
      Splits.temporalEmbargoSplit(withNull, "d", 10, 5).collect())
    assert(messages(e).exists(_.contains("temporalEmbargoSplit")))
    intercept[IllegalArgumentException](
      Splits.temporalEmbargoSplit(rows.toDF("id", "d"), "d", 0, 5))
  }

  test("lengthBuckets: ladder assignment, truncation, efficiency by hand") {
    // token counts: 3 → cap 4; 4 → cap 4 (boundary inclusive); 5, 7 →
    // cap 8; 20, 25 → truncated to top cap 16
    val texts = Seq(3, 4, 5, 7, 20, 25).zipWithIndex
      .map { case (t, i) => (i.toLong, Seq.fill(t)("w").mkString(" ")) }
    val got = Splits.lengthBuckets(texts.toDF("doc_id", "text"),
        caps = Seq(4L, 8L, 16L))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (4L, 2L, 0L, 7L, 8L, 7L * 1000000L / 8L),
      (8L, 2L, 0L, 12L, 16L, 12L * 1000000L / 16L),
      (16L, 2L, 2L, 32L, 32L, 1000000L)))
  }

  test("trainingOrder is a dense 1..n permutation matching the flat row_number") {
    val df = (1L to 500L).map(i => Tuple1(i * 7)).toDF("doc_id")
    val got = Splits.trainingOrder(df, "doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._2).sorted == (1L to 500L), "positions must be dense 1..n")
    // the order must equal the single-partition reference: sort by the
    // same md5-60-bit value with key tie-break
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def h(k: Long): Long = java.lang.Long.parseLong(md5hex(k.toString).take(15), 16)
    val want = got.map(_._1).sortBy(k => (h(k), k)).zipWithIndex
      .map { case (k, i) => (k, i + 1L) }.sortBy(_._1)
    assert(got.sortBy(_._1) == want)
  }

  test("trainingOrder is partitioning-invariant and bucket-count-invariant") {
    val df = (1L to 300L).map(Tuple1(_)).toDF("doc_id")
    val a = rows(Splits.trainingOrder(df.repartition(1), "doc_id"))
    val b = rows(Splits.trainingOrder(df.repartition(17), "doc_id"))
    val c = rows(Splits.trainingOrder(df, "doc_id", nBuckets = 16))
    assert(a == b && a == c)
    intercept[IllegalArgumentException](Splits.trainingOrder(df, "doc_id", 100))
  }

  test("lengthBuckets rejects an unsorted or duplicated cap ladder") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Splits.lengthBuckets(df, caps = Seq(8L, 4L)))
    intercept[IllegalArgumentException](
      Splits.lengthBuckets(df, caps = Seq(4L, 4L, 8L)))
    intercept[IllegalArgumentException](Splits.lengthBuckets(df, caps = Nil))
  }

  test("kFold: cluster members share a fold, folds are dense and stable") {
    // docs 1..200; clusters: {1,2,3}→1, {10,11}→10
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val df = (1L to 200L).map(Tuple1(_)).toDF("doc_id")
    val got = Splits.kFold(df, "doc_id", clusters, k = 5)
      .select("doc_id", "split_key", "fold")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 200)
    val byId = got.map(r => r._1 -> r).toMap
    // clustered docs key on the representative and so share the fold
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).distinct.size == 1)
    assert(Seq(10L, 11L).map(byId(_)._3).distinct.size == 1)
    // unclustered docs key on themselves
    assert(byId(42L)._2 == 42L)
    // every fold in [0, 5) and all present at n=200
    assert(got.map(_._3).toSet == (0L until 5L).toSet)
    // pure function of keys: repartitioning changes nothing
    val again = Splits.kFold(df.repartition(13), "doc_id", clusters, k = 5)
      .select("doc_id", "split_key", "fold")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.sortBy(_._1) == again.sortBy(_._1))
    intercept[IllegalArgumentException](
      Splits.kFold(df, "doc_id", clusters, k = 1))
    intercept[IllegalArgumentException](
      Splits.kFold(df, "doc_id", clusters.select(col("doc_id")), k = 5))
  }
}
