package graft.functions

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Unit + property tests for every cleaner/scraper/cropper scalar function,
  * expectations hand-computed from the reference semantics
  * (`data_cleaner/pnp-cleanerLambda.py:15-48`, `scraper/pnpscrLambda.py:99-104`,
  * `cropper/pnp-cropperLambda.py:88-90`).
  */
class ProductNormalizeSpec extends SparkTestBase {

  private def evalStr(c: org.apache.spark.sql.Column, input: String): Option[String] = {
    import spark.implicits._
    Seq(Option(input)).toDF("x").select(c).collect()(0) match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getString(0))
    }
  }

  private def brand(s: String) = evalStr(ProductNormalize.normalizeBrand(col("x")), s)
  private def unit(s: String) = evalStr(ProductNormalize.normalizeUnit(col("x")), s)

  test("normalize_brand: dictionary hits, passthrough, null/empty") {
    assert(brand("Pick n Pay") === Some("PnP"))
    assert(brand("no name™") === Some("no name"))
    assert(brand("no name") === Some("no name"))
    assert(brand("KOO") === Some("Koo"))
    assert(brand("Clover") === Some("Clover"))
    assert(brand("  Westfalia  ") === Some("Westfalia")) // trim before lookup
    assert(brand(null) === None)
    assert(brand("") === None) // Python falsy "" -> None
  }

  test("normalize_unit: magnitude-embedded, synonyms, passthrough, null/empty") {
    assert(unit("8kg") === Some("kg"))   // pnp-cleanerLambda.py:45-46
    assert(unit("500g") === Some("g"))
    assert(unit("330ml") === Some("ml"))
    assert(unit("2l") === Some("l"))     // regex branch wins BEFORE the map
    assert(unit("L") === Some("litre"))
    assert(unit("litres") === Some("litre"))
    assert(unit("Each") === Some("each"))
    assert(unit(" PACK ") === Some("pack"))
    assert(unit("bunch") === Some("bunch")) // unknown passthrough
    assert(unit(null) === None)
    assert(unit("") === None)
  }

  test("normalize_unit 2l quirk matches the reference exactly") {
    // "2l" hits the regex branch -> "l" (NOT "litre"): the reference returns
    // the regex group without re-applying the map. Faithful, if surprising.
    assert(unit("2l") === Some("l"))
  }

  test("date_slug strips Valid and sanitizes") {
    val slug = evalStr(ProductNormalize.dateSlug(col("x")), "Valid 13 February - 15 February 2026")
    assert(slug === Some("13_February_-_15_February_2026"))
  }

  test("province from link text") {
    assert(evalStr(ProductNormalize.provinceFromLink(col("x")), "  Eastern Cape ")
      === Some("Eastern_Cape"))
  }

  test("filename sanitization: charset, spaces, strip, truncate") {
    val s = evalStr(ProductNormalize.sanitizeFilename(col("x")), "Coke® 2L + Chips (Combo!)")
    assert(s.isDefined)
    assert(s.get.matches("[A-Za-z0-9_-]+"))
    assert(!s.get.startsWith("_") && !s.get.endsWith("_"))
    val long = evalStr(ProductNormalize.sanitizeFilename(col("x")), "a" * 80)
    assert(long.get.length === 50)
  }

  test("date-range slug parses into valid_from/valid_to (year borrowed)") {
    import spark.implicits._
    val df = Seq("13_February_-_15_February_2026").toDF("x")
      .select(ProductNormalize.validFrom(col("x")).as("f"),
        ProductNormalize.validTo(col("x")).as("t"))
    val r = df.collect()(0)
    assert(r.getAs[Date]("f") === Date.valueOf("2026-02-13"))
    assert(r.getAs[Date]("t") === Date.valueOf("2026-02-15"))
  }

  test("unparseable date-range yields nulls, not errors (ANSI-safe)") {
    import spark.implicits._
    val r = Seq("Weekly_Specials").toDF("x")
      .select(ProductNormalize.validFrom(col("x")), ProductNormalize.validTo(col("x")))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  // ScalaCheck generators with a pinned seed (no scalatestplus bridge in
  // the offline cache); each property evaluates the whole sample batch in
  // ONE Spark pass (f and f∘f as nested columns) — no per-sample jobs.
  private val asciiish: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '_', '-', '™', '®', '!')))
      .map(_.mkString)

  private def samples(n: Int): Seq[String] =
    Gen.listOfN(n, asciiish).pureApply(Gen.Parameters.default, Seed(42L)) ++
      Seq("", "   ", "2l", "8kg", "Pick n Pay", "no name™", "_x_", "a" * 80)

  test("property: normalize_brand / normalize_unit are idempotent (modulo faithful edges)") {
    import spark.implicits._
    val rows = samples(200).toDF("x").select(
      ProductNormalize.normalizeBrand(col("x")).as("b1"),
      ProductNormalize.normalizeBrand(ProductNormalize.normalizeBrand(col("x"))).as("b2"),
      ProductNormalize.normalizeUnit(col("x")).as("u1"),
      ProductNormalize.normalizeUnit(ProductNormalize.normalizeUnit(col("x"))).as("u2"))
      .collect()
    rows.foreach { r =>
      def get(i: Int) = if (r.isNullAt(i)) None else Some(r.getString(i))
      // whitespace-only input -> "" after one pass -> null after two
      // (the reference's Python truthiness does the same)
      assert(get(1) === get(0).filter(_.nonEmpty))
      // units have one more faithful non-fixed-point: "2l" -> "l" on the
      // regex branch, and a second pass maps bare "l" -> "litre" (the
      // reference behaves identically)
      assert(get(3) === get(2).filter(_.nonEmpty).map {
        case "l" => "litre"
        case u   => u
      })
    }
  }

  test("property: sanitized filenames only contain [A-Za-z0-9_-] and fit 50 chars") {
    import spark.implicits._
    samples(200).toDF("x")
      .select(ProductNormalize.sanitizeFilename(col("x")).as("s"))
      .collect()
      .foreach { r =>
        val out = r.getString(0)
        assert(out.length <= 50)
        assert(out.isEmpty || out.matches("[A-Za-z0-9_-]+"))
      }
  }
}
