package graft

import org.scalatest.funsuite.AnyFunSuite

/** Non-ASCII behavior of UTF8_LCASE vs the lower() rewrite (VERDICT r8
  * #7). The `fn_collation` oracle models collated grouping with DuckDB
  * `lower()`; that twin is EXACT on the ASCII-only fixture, and this
  * spec pins down (empirically, against this Spark build) where the two
  * semantics agree and the one place they diverge, so the equivalence's
  * boundary is documented rather than assumed.
  *
  * Characters via escapes to keep the source ASCII:
  * É/é = E/e-acute, ß = sharp s, İ/ı =
  * Turkish dotted-I/dotless-i, Ο/ο = Omicron/omicron,
  * Σ/σ/ς = Sigma/sigma/final-sigma, ́ = combining
  * acute. */
class CollationSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def eq2(a: String, b: String): (Boolean, Boolean) = {
    val r = spark.sql(
      s"SELECT collate('$a','UTF8_LCASE') = collate('$b','UTF8_LCASE'), " +
      s"lower('$a') = lower('$b')").collect()(0)
    (r.getBoolean(0), r.getBoolean(1))
  }

  test("UTF8_LCASE and lower() agree on case-insensitive accented matches") {
    // simple bicameral case pairs — including non-ASCII letters — fold
    // identically under both semantics
    assert(eq2("CAFÉ", "café") == (true, true))
    // (sigma NOT in final position — a trailing capital Σ would
    // lowercase to final-form ς and land in the divergence below)
    assert(eq2("ΣÍΑ", "σíα") == (true, true))
    // and both are sensitive to genuinely different letters
    assert(eq2("café", "cafe") == (false, false))
  }

  test("divergence: Greek final sigma is equal under UTF8_LCASE, not lower()") {
    // lower('ΟΣ') ends in FINAL sigma ς (position-aware
    // Unicode case mapping), while a literal 'σ' stays σ — so
    // the lower() rewrite keeps them distinct. UTF8_LCASE folds
    // ς == σ, merging the group. THE one semantic gap in the
    // fn_collation oracle twin; impossible on the ASCII fixture.
    assert(eq2("ΟΣ", "οσ") == (true, false))
    assert(eq2("ος", "οσ") == (true, false))
  }

  test("non-divergences: no ss-folding, no Turkish locale, no normalization") {
    // UTF8_LCASE is lowercase-comparison, NOT full case folding or a
    // locale collation: sharp-s != ss, dotted/dotless I follow root
    // (non-Turkish) mappings, and no Unicode normalization happens —
    // precomposed e-acute differs from e + combining acute under BOTH
    // semantics, same as the lower() twin.
    assert(eq2("STRASSE", "straße") == (false, false))
    assert(eq2("İ", "i") == (false, false))
    assert(eq2("I", "ı") == (false, false))
    assert(eq2("café", "café") == (false, false))
  }

  test("collated grouping merges non-ASCII case variants end-to-end") {
    import spark.implicits._
    val df = Seq("CAFÉ", "café", "Café", "tea")
      .toDF("s")
    val got = df.groupBy(org.apache.spark.sql.functions.expr(
        "collate(s, 'UTF8_LCASE')"))
      .count().collect().map(_.getLong(1)).sorted.toSeq
    assert(got == Seq(1L, 3L))
  }
}
