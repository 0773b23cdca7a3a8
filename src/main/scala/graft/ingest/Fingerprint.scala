package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset content fingerprinting — the versioning primitive a 100 TB
  * corpus needs before anything else: "is the table I trained on the
  * table you audited?" answered without shipping or re-sorting rows.
  *
  * Per row: a canonical field encoding — each column cast to string and
  * LENGTH-PREFIXED (`<len>:<value>`, null → the single letter `N`),
  * fields joined on U+0001 — is md5'd and its first 32 bits become the
  * row digest. The length prefix makes the encoding injective even when
  * U+0001 legitimately occurs inside free text, and the null sentinel
  * distinguishes `(null, "x")` from `("x", null)` — a bare `concat_ws`
  * SKIPS null fields, so those two rows would otherwise encode
  * identically and the "any changed row moves the fingerprint" contract
  * would silently fail on nullable columns (ADVICE r8). Per slice: row
  * digests are SUMMED — addition is commutative/associative, so the
  * fingerprint is invariant to row order, partitioning, shuffle plan
  * and file layout, and ADDITIVE across disjoint slices:
  * `fp(A ∪ B) = fp(A) + fp(B)`. Per-shard fingerprints therefore roll
  * up to any coarser granularity with no rescan — the merkle-style
  * property that lets a catalog carry per-partition digests and verify
  * a whole table from metadata.
  *
  * Any changed, added, dropped or duplicated row moves the sum (a
  * changed row moves it by h_new − h_old ≠ 0 unless the 32-bit digests
  * collide, p ≈ 2⁻³²) — unlike count/sum audits, which a
  * compensating pair of edits can fool.
  *
  * Overflow envelope: digests are < 2³², so BIGINT sums are exact up
  * to 2³¹ rows PER SLICE; [[fingerprint]] fail-louds beyond that
  * (slices at 100 TB are per-partition — billions of rows belong in
  * thousands of slices, which is also what makes the scan parallel).
  * Everything replays in any engine with md5 — the q203 oracle
  * hash-gates every digest.
  */
object Fingerprint {

  /** 32-bit row digest of the injective canonical encoding of `cols`
    * (length-prefixed fields, `N` for null — see object doc). The
    * oracle replays it as `length(x)::VARCHAR || ':' || x` joined on
    * `chr(1)`; both engines count string length in codepoints. */
  def rowDigest(cols: Seq[Column]): Column = {
    val enc = cols.map { c =>
      val s = c.cast("string")
      when(c.isNull, lit("N"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    conv(substring(md5(concat_ws("\u0001", enc: _*)), 1, 8), 16, 10)
      .cast("long")
  }

  /** Per-slice (n_rows, fp) with the 2³¹-rows exactness guard. */
  def fingerprint(df: DataFrame, sliceCol: String, cols: Seq[Column]): DataFrame =
    df.groupBy(col(sliceCol).as("slice"))
      .agg(count(lit(1)).as("n_rows"), sum(rowDigest(cols)).as("fp"))
      .select(col("slice"),
        when(col("n_rows") > (1L << 31),
          raise_error(concat(lit("fingerprint: slice exceeds 2^31 rows at "),
            col("slice").cast("string")))).otherwise(col("n_rows")).as("n_rows"),
        col("fp"))
}
