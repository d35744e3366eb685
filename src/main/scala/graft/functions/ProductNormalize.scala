package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-column implementations of the reference cleaner/scraper/cropper
  * scalar functions (SURVEY §2.4) — no UDFs, so every one of them stays
  * inside whole-stage codegen and Catalyst can push/fold around them.
  *
  * Each function carries its DuckDB twin (`*Sql`, taking a SQL expression
  * string) so oracle queries are built from the same rules and cannot drift.
  * Null/empty handling mirrors the reference's Python truthiness checks
  * (`if not brand: return None`).
  */
object ProductNormalize {

  // ---------------------------------------------------------------- brand

  /** Brand dictionary of the reference cleaner
    * (`data_cleaner/pnp-cleanerLambda.py:15-26`).
    */
  val BrandMap: Seq[(String, String)] = Seq(
    "Pick n Pay" -> "PnP",
    "no name™" -> "no name",
    "no name" -> "no name",
    "KOO" -> "Koo")

  /** `normalize_brand`: None/"" → null; else trim, dictionary map with
    * identity fallback (`pnp-cleanerLambda.py:15-26`).
    */
  def normalizeBrand(c: Column): Column = {
    val t = trim(c)
    val m = map(BrandMap.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    when(c.isNull || c === "", lit(null).cast("string"))
      .otherwise(coalesce(try_element_at(m, t), t))
  }

  def normalizeBrandSql(x: String): String = {
    val cases = BrandMap
      .map { case (k, v) => s"WHEN trim($x) = '$k' THEN '$v'" }
      .mkString("\n       ")
    s"""CASE WHEN $x IS NULL OR $x = '' THEN NULL
       $cases
       ELSE trim($x) END"""
  }

  // ----------------------------------------------------------------- unit

  /** Unit synonym dictionary (`pnp-cleanerLambda.py:28-48`; the duplicate
    * "l" key in the source is collapsed — it was a no-op quirk).
    */
  val UnitMap: Seq[(String, String)] = Seq(
    "l" -> "litre", "litre" -> "litre", "litres" -> "litre",
    "ml" -> "ml", "g" -> "g", "kg" -> "kg",
    "pack" -> "pack", "each" -> "each")

  private val MagnitudeUnitRe = "^[0-9]+(kg|g|ml|l)$"

  /** `normalize_unit`: None/"" → null; lower+trim; "8kg"/"500g" → trailing
    * unit (magnitude dropped, as the reference does); else synonym map with
    * identity fallback (`pnp-cleanerLambda.py:28-48`).
    */
  def normalizeUnit(c: Column): Column = {
    val u = lower(trim(c))
    val m = map(UnitMap.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    when(c.isNull || c === "", lit(null).cast("string"))
      .when(u.rlike(MagnitudeUnitRe), regexp_extract(u, "(kg|g|ml|l)$", 1))
      .otherwise(coalesce(try_element_at(m, u), u))
  }

  def normalizeUnitSql(x: String): String = {
    val u = s"lower(trim($x))"
    s"""CASE WHEN $x IS NULL OR $x = '' THEN NULL
       WHEN regexp_matches($u, '$MagnitudeUnitRe')
         THEN regexp_extract($u, '(kg|g|ml|l)${"$"}', 1)
       WHEN $u IN ('l', 'litre', 'litres') THEN 'litre'
       ELSE $u END"""
  }

  // ------------------------------------------------- scraper derivations

  /** `date_slug` (P1): drop every "Valid" occurrence, trim, then map any
    * char outside [A-Za-z0-9_-] to "_" (`scraper/pnpscrLambda.py:99-100`).
    */
  def dateSlug(c: Column): Column =
    regexp_replace(trim(regexp_replace(c, "Valid", "")), "[^A-Za-z0-9_-]", "_")

  def dateSlugSql(x: String): String =
    s"regexp_replace(trim(regexp_replace($x, 'Valid', '', 'g')), '[^A-Za-z0-9_-]', '_', 'g')"

  /** `province` from link text (P2): trim + spaces→underscores
    * (`pnpscrLambda.py:104`).
    */
  def provinceFromLink(c: Column): Column =
    regexp_replace(trim(c), " ", "_")

  def provinceFromLinkSql(x: String): String =
    s"regexp_replace(trim($x), ' ', '_', 'g')"

  // ------------------------------------------------ cropper file naming

  /** Filename sanitization (P12): keep [A-Za-z0-9 _-], others→"_", then
    * spaces→"_", strip leading/trailing "_", truncate to 50 chars
    * (`cropper/pnp-cropperLambda.py:88-90`; ASCII approximation of
    * Python's unicode isalnum — identical on the reference's data).
    */
  def sanitizeFilename(c: Column): Column =
    substring(
      regexp_replace(
        regexp_replace(regexp_replace(c, "[^A-Za-z0-9 _-]", "_"), " ", "_"),
        "^_+|_+$", ""),
      1, 50)

  def sanitizeFilenameSql(x: String): String =
    "substring(regexp_replace(regexp_replace(regexp_replace(" +
      s"$x, '[^A-Za-z0-9 _-]', '_', 'g'), ' ', '_', 'g'), " +
      "'^_+|_+$', '', 'g'), 1, 50)"

  // ------------------------------------------------- date-range parsing

  /** Parse the reference's date_range slug ("13_February_-_15_February_2026")
    * into real dates — the engine extension SURVEY §7.4 item 2 requires for
    * any "latest catalogue" analytics (the reference leaves them as strings).
    * The from-part borrows the to-part's year when it has none (slugs never
    * carry two years); unparseable slugs yield null, not an error
    * (try_to_date — ANSI-safe).
    */
  def validTo(slug: Column): Column =
    try_to_date(toPartStr(slug), "d MMMM yyyy")

  def validFrom(slug: Column): Column = {
    val fromRaw = trim(regexp_replace(try_element_at(split(slug, "_-_"), lit(1)), "_", " "))
    val year = regexp_extract(toPartStr(slug), "([0-9]{4})$", 1)
    val full = when(fromRaw.rlike("[0-9]{4}$"), fromRaw)
      .otherwise(concat(fromRaw, lit(" "), year))
    try_to_date(full, "d MMMM yyyy")
  }

  private def toPartStr(slug: Column): Column =
    trim(regexp_replace(try_element_at(split(slug, "_-_"), lit(2)), "_", " "))

  private def toPartSqlStr(x: String): String =
    s"trim(replace(string_split($x, '_-_')[2], '_', ' '))"

  def validToSql(x: String): String =
    s"try_strptime(${toPartSqlStr(x)}, '%-d %B %Y')::DATE"

  def validFromSql(x: String): String = {
    val fromRaw = s"trim(replace(string_split($x, '_-_')[1], '_', ' '))"
    val year = s"regexp_extract(${toPartSqlStr(x)}, '([0-9]{4})${"$"}', 1)"
    s"""try_strptime(CASE WHEN regexp_matches($fromRaw, '[0-9]{4}${"$"}')
       THEN $fromRaw ELSE $fromRaw || ' ' || $year END, '%-d %B %Y')::DATE"""
  }
}
