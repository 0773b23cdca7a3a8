package graft

import graft.text.TextStats
import graft.multimodal.Multimodal

class TextModulesSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toList.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("profile counts tokens, chars and ratios exactly") {
    val d = docs((1L, "the cat and the dog", "s"))
    val r = TextStats.profile(d)
      .select("n_tokens", "n_chars", "avg_token_len", "stopword_ratio",
        "unique_ratio", "top_token_ratio", "lang_pred")
      .collect().head
    assert(r.getLong(0) == 5)
    assert(r.getLong(1) == 19)
    assert(r.getDouble(2) == 3.8)
    assert(r.getDouble(3) == 0.6)     // the, and, the
    assert(r.getDouble(4) == 0.8)     // 4 distinct of 5 tokens
    assert(r.getDouble(5) == 0.4)     // "the" twice
    assert(r.getString(6) == "en")
  }

  test("lang prediction follows marker-lexicon argmax with deterministic ties") {
    val d = docs(
      (1L, "der hund und die katze ist", "s"),
      (2L, "le chat et la mer est", "s"),
      (3L, "qqq www eee", "s"),                 // no markers → und
      (4L, "los gatos y el perro", "s"),        // es
      (5L, "wo shi zai jia le he ni", "s"))     // zh (pinyin markers)
    val out = TextStats.profile(d).select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "de", 2L -> "fr", 3L -> "und", 4L -> "es", 5L -> "zh"))
  }

  test("fingerprint is whitespace-canonical") {
    val d = docs((1L, "a b  c", "s"), (2L, "a b c", "s"))
    val fps = TextStats.profile(d).select("fingerprint").collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("quality score penalizes short docs and caps punctuation penalty") {
    val d = docs((1L, "one two", "s"), // < 5 tokens → 0
      (2L, ("word " * 30).trim, "s"))  // long, clean → 1.0 - 0 - 0 = 1.0
    val out = TextStats.profile(d).select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.0 && out(2L) == 1.0)
  }

  test("multimodal: stub codec features are deterministic byte functions") {
    val rec = Multimodal.MediaRecord(1L, "text/plain", "AB".getBytes("UTF-8"),
      Multimodal.MediaMeta("s", 2L))
    val f = Multimodal.FakeCodec.decode(rec)
    assert(f.n_bytes == 2 && f.head_byte == 65 && f.checksum == 65 + 66)
  }

  test("multimodal: empty payload decodes to sentinel head byte") {
    val f = Multimodal.FakeCodec.decode(
      Multimodal.MediaRecord(1L, "text/plain", Array.emptyByteArray,
        Multimodal.MediaMeta("s", 0L)))
    assert(f.head_byte == -1 && f.checksum == 0)
  }

  test("multimodal pipeline: features flow from payloads to a source profile") {
    val d = docs((1L, "abc", "s1"), (2L, "de", "s1"), (3L, "x", "s2"))
    val prof = rows(Multimodal.profileBySource(
      Multimodal.extractFeatures(Multimodal.toMedia(spark, d))))
    // s1: 2 docs, 5 bytes; s2: 1 doc, 1 byte
    assert(prof.map(r => (r(0), r(1), r(2))) == Seq(("s1", 2L, 5L), ("s2", 1L, 1L)))
  }

  test("multimodal: toMedia drops null-text docs instead of emitting null payloads") {
    // encode(null) → null payload, which every downstream transform
    // dereferences: the row must be excluded at the boundary (matching
    // how the SQL oracles drop NULLs), not NPE in an executor
    val d = Seq((1L, "ab", "s1"), (2L, null.asInstanceOf[String], "s1"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.toMedia(spark, d).collect()
    assert(media.map(_.doc_id).toSeq == Seq(1L))
    // and the frame/resize paths run clean over the filtered set
    assert(Multimodal.sampleFrames(
      Multimodal.resizePayload(Multimodal.toMedia(spark, d), 1), 1, 1)
      .collect().map(f => (f.doc_id, f.frame_idx)).toSeq == Seq((1L, 0)))
  }

  test("multimodal: resizePayload truncates payload and keeps metadata consistent") {
    val d = docs((1L, "abcdefgh", "s1"), (2L, "xy", "s1"))
    val resized = Multimodal.resizePayload(Multimodal.toMedia(spark, d), 4)
      .collect().map(r => r.doc_id -> r).toMap
    assert(new String(resized(1L).payload, "UTF-8") == "abcd")
    assert(resized(1L).meta.n_bytes == 4L)
    // under-limit payloads pass through untouched
    assert(new String(resized(2L).payload, "UTF-8") == "xy")
    assert(resized(2L).meta.n_bytes == 2L)
  }

  test("multimodal: sampleFrames emits stride-spaced frames, short tail, none for empty") {
    val d = docs((1L, "abcdefghij", "s1"), (2L, "", "s1"))
    val frames = Multimodal.sampleFrames(Multimodal.toMedia(spark, d),
        frameSize = 4, stride = 4)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    // doc 1: 10 bytes → frames of 4, 4, 2; heads 'a','e','i'
    assert(frames.map(f => (f.doc_id, f.frame_idx, f.n_bytes, f.head_byte)).toSeq ==
      Seq((1L, 0, 4L, 'a'.toLong), (1L, 1, 4L, 'e'.toLong), (1L, 2, 2L, 'i'.toLong)))
  }

  test("multimodal: overlapping frames (stride < frameSize) cover the payload") {
    val d = docs((1L, "abcdef", "s1"))
    val frames = Multimodal.sampleFrames(Multimodal.toMedia(spark, d),
        frameSize = 4, stride = 2)
      .collect().sortBy(_.frame_idx)
    // offsets 0,2,4 → lengths 4,4,2; heads 'a','c','e'
    assert(frames.map(f => (f.frame_idx, f.n_bytes, f.head_byte)).toSeq ==
      Seq((0, 4L, 'a'.toLong), (1, 4L, 'c'.toLong), (2, 2L, 'e'.toLong)))
  }

  test("lineRepetition computes duplicate-line fractions exactly") {
    // doc 1: 4 lines, "aa" twice (2 chars each), "b", "ccc" once →
    //   dup_line_fraction 2/4, dup chars 4 of 4+1+3=8
    // doc 2: no duplicate lines
    val d = docs(
      (1L, "aa\nb\naa\nccc", "s"),
      (2L, "x\ny", "s"))
    val out = TextStats.lineRepetition(d).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 4L)
    assert(r1.getDouble(2) == 0.5)
    assert(r1.getDouble(3) == 0.5)
    val r2 = out(1)
    assert(r2.getLong(1) == 2L && r2.getDouble(2) == 0.0 && r2.getDouble(3) == 0.0)
  }

  test("lineRepetition and decontamination tolerate empty inputs") {
    val none = docs()
    assert(TextStats.lineRepetition(none).count() == 0)
    val some = docs((1L, "a b c d e f", "s"))
    assert(graft.text.Decontaminate.overlaps(some, none).count() == 0)
    assert(graft.text.Decontaminate.overlaps(none, some).count() == 0)
  }

  test("decontamination flags exactly the train docs sharing an n-gram with eval") {
    val train = docs(
      (1L, "a b c d e f g", "s"),   // shares "a b c d e" with eval doc 10
      (2L, "p q r s t u v", "s"))   // clean
    val eval = docs((10L, "z a b c d e zz", "s"))
    val out = rows(graft.text.Decontaminate.overlaps(train, eval, n = 5))
    // train doc 1 shingles: {a b c d e, b c d e f, c d e f g};
    // eval: {z a b c d, a b c d e, b c d e zz} → one shared shingle
    assert(out == Seq(Seq(1L, 1L)))
  }

  test("overlapsBloom returns exactly the broadcast-exact decontamination result") {
    val train = docs(
      (1L, "a b c d e f g", "s"),
      (2L, "p q r s t u v", "s"),
      (3L, "z a b c d e zz more stuff here", "s"))
    val eval = docs((10L, "z a b c d e zz", "s"), (11L, "q r s t u extra", "s"))
    val exact = rows(graft.text.Decontaminate.overlaps(train, eval, n = 5))
    val bloom = rows(graft.text.Decontaminate.overlapsBloom(train, eval, n = 5))
    assert(bloom == exact && exact.nonEmpty)
  }

  test("lineRepetition: top-bigram concentration and the too-short guard") {
    // doc 1 tokens: a b a b a → bigrams: "a b","b a","a b","b a" →
    //   top "a b" = 2 of 4 → 0.5
    // doc 2: single token → no bigrams → 0.0
    val d = docs((1L, "a b a b a", "s"), (2L, "only", "s"))
    val out = TextStats.lineRepetition(d).orderBy("doc_id").collect()
    assert(out(0).getDouble(4) == 0.5)
    assert(out(1).getDouble(4) == 0.0)
  }

  test("histogramNearDup == brute byte-histogram L1 with threshold") {
    def hist(s: String): Array[Long] = {
      val h = new Array[Long](256)
      s.getBytes("UTF-8").foreach(b => h(b & 0xff) += 1)
      h
    }
    def l1(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
    // 1 vs 2: swap two chars → l1 = 0 (anagram, the histogram blind
    // spot — DOCUMENTED perceptual behavior); 1 vs 3: one char
    // changed → l1 = 2; 4 is far in size → blocked out
    val texts = Seq((1L, "abcabc", "s"), (2L, "cbacba", "s"),
      (3L, "abcabd", "s"), (4L, "a" * 50, "s"))
    val d = docs(texts: _*)
    val got = Multimodal.histogramNearDup(Multimodal.toMedia(spark, d), 5L)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(p => (p._1, p._2))
    val byId = texts.map(t => t._1 -> hist(t._2)).toMap
    val nb = texts.map(t => t._1 -> t._2.length.toLong).toMap
    val want = (for {
      a <- byId.keys; b <- byId.keys if a < b
      if math.abs(nb(a) - nb(b)) <= 5 && l1(byId(a), byId(b)) <= 5
    } yield (a, b, l1(byId(a), byId(b)))).toSeq.sortBy(p => (p._1, p._2))
    assert(got == want)
    assert(got.contains((1L, 2L, 0L)) && got.contains((1L, 3L, 2L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("histogramNearDup size band is lossless at the exact boundary") {
    // sizes differ by exactly the threshold and all diff mass is the
    // size delta: l1 == threshold must SURVIVE (band edge inclusive)
    val d = docs((1L, "aaaa", "s"), (2L, "aaaaaa", "s"))
    val got = Multimodal.histogramNearDup(Multimodal.toMedia(spark, d), 2L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L)))
  }
}
