package graft

import org.scalacheck.Gen
import graft.text.Dedup

/** Round-6 randomized parity suites for the dedup family operators that
  * previously had example-only coverage:
  *
  *   1. simhashPairs vs brute-force Hamming — pigeonhole banding is
  *      deterministically COMPLETE for distance ≤ maxHamming (any pair
  *      within d agrees on ≥1 of d+1 chunks), so exact set equality is
  *      the contract, not a recall bound;
  *   2. minhashLsh vs exact ngramJaccard — LSH recall is probabilistic,
  *      but precision is exact (candidates are verified on true
  *      shingles): every emitted pair must appear in the exact
  *      operator's output with the identical jaccard, and identical
  *      documents (whose signatures agree on every band) must always be
  *      recalled;
  *   3. duplicateClusters vs brute-force connected components — min
  *      labels, membership, and the is_kept survivor flag.
  *
  * Fixed ScalaCheck seeds (same rationale as PropertiesSpec):
  * deterministic, reproducible failures.
  */
class Round6PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  /** Replicates Splits.bucket: first 8 md5-hex chars of the id string,
    * base-16 → long, mod 10000. */
  private def bucket(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % 10000
  }

  test("simhashPairs == brute-force hamming pairs on random corpora") {
    // tiny token alphabet → heavy fingerprint collisions → a dense pair
    // space that exercises candidate buckets AND the exact verify
    val docGen = Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))
    samples(Gen.listOfN(14, docGen), n = 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val fps = Dedup.simhash(docs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (for {
        a <- fps.keys; b <- fps.keys if a < b
        h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 3
      } yield Seq[Any](a, b, h.toLong)).toSet
      val got = rows(Dedup.simhashPairs(docs, maxHamming = 3)).toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("minhashLsh: exact precision vs ngramJaccard, identical docs always recalled") {
    val docGen = Gen.listOfN(6, Gen.oneOf("u", "v", "w", "x", "y", "z")).map(_.mkString(" "))
    samples(Gen.listOfN(10, docGen), n = 4).foreach { texts =>
      // plant an exact duplicate of doc 0 under id 100: all bands agree
      // on identical signatures, so recall of this pair is deterministic
      val all = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+ (100L, texts.head)
      val docs = all.toDF("doc_id", "text")
      val exact = rows(Dedup.ngramJaccard(docs, n = 3, threshold = 0.4))
        .map(r => (r(0), r(1)) -> r(2)).toMap
      val lsh = rows(Dedup.minhashLsh(docs, n = 3, bands = 32, rows = 2, threshold = 0.4))
      lsh.foreach { r =>
        assert(exact.get((r(0), r(1))).contains(r(2)),
          s"pair (${r(0)},${r(1)}) score ${r(2)} not in exact output")
      }
      assert(lsh.exists(r => r(0) == 0L && r(1) == 100L && r(2) == 1.0),
        "planted identical pair (0,100) not recalled at jaccard 1.0")
    }
  }

  test("packByBudget == brute-force per-bucket prefix-sum packing") {
    import graft.text.Splits
    val rowGen = Gen.listOf(Gen.zip(Gen.choose(0L, 40L), Gen.choose(1L, 50L)))
      .map(_.distinctBy(_._1)).suchThat(_.nonEmpty)
    samples(rowGen, n = 6).foreach { docs =>
      val got = rows(Splits.packByBudget(docs.toDF("doc_id", "n_chars"),
          "doc_id", "n_chars", budget = 60, buckets = 4)
        .select("doc_id", "pack_bucket", "pack_id")).toSet
      val want = docs.groupBy(d => bucket(d._1) % 4).flatMap { case (b, ds) =>
        var before = 0L
        ds.sortBy(_._1).map { case (id, w) =>
          val pid = before / 60
          before += w
          Seq[Any](id, b, pid)
        }
      }.toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("Chunker.chunks == brute-force sliding windows on random corpora") {
    val docGen = Gen.choose(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")))
    samples(Gen.listOfN(8, docGen), n = 4).foreach { docsTokens =>
      val docs = docsTokens.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toDF("doc_id", "text")
      val got = rows(graft.text.Chunker.chunks(docs, chunkSize = 5, stride = 3)).toSet
      val want = docsTokens.zipWithIndex.flatMap { case (ts, i) =>
        (0 to math.max(ts.size - 1, 0) by 3).zipWithIndex.map { case (start, cid) =>
          val sl = ts.slice(start, start + 5)
          Seq[Any](i.toLong, cid.toLong, sl.size.toLong, sl.mkString(" "))
        }
      }.toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("Splits.assign matches the md5 bucket threshold rule") {
    import graft.text.Splits
    samples(Gen.listOf(Gen.choose(0L, 100000L)).map(_.distinct).suchThat(_.nonEmpty),
        n = 4).foreach { ids =>
      val got = rows(Splits.assign(ids.map(Tuple1(_)).toDF("doc_id"), "doc_id")).toSet
      val want = ids.map { id =>
        val bk = bucket(id)
        Seq[Any](id,
          if (bk < 8000) "train" else if (bk < 9000) "val" else "test")
      }.toSet
      assert(got == want)
    }
  }

  test("duplicateClusters == brute-force connected components on random graphs") {
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) })
      .suchThat(_.nonEmpty)
    samples(edgeGen, n = 6).foreach { es =>
      val pairs = es.toDF("doc_id_1", "doc_id_2")
      // brute force: union-find over the same edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(d => Seq[Any](d, find(d), d == find(d))).toSet
      val got = rows(Dedup.duplicateClusters(pairs)).toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }
}
