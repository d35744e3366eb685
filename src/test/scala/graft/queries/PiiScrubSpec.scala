package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Behavior of the PII redaction itself (t13's oracle run on the fixture
  * proves pipeline parity but the fixture contains no PII — this is where
  * actual emails/phones/IPs go in and tags come out).
  */
class PiiScrubSpec extends SparkTestBase {

  private def scrub(texts: String*): Seq[String] = {
    import spark.implicits._
    texts.toDF("text")
      .select(TextAnalysis.scrubPii(col("text")).as("s"))
      .collect().map(_.getString(0)).toSeq
  }

  test("each PII class redacts to its tag") {
    assert(scrub("mail me at jane.doe+spam@sub.example.co today") ===
      Seq("mail me at [EMAIL] today"))
    assert(scrub("call +27 (0)21 555 0199 now") === Seq("call [PHONE] now"))
    assert(scrub("host 192.168.10.254 is down") === Seq("host [IP] is down"))
  }

  test("classes compose in one pass and untouched text survives byte-for-byte") {
    assert(scrub("bob@ex.com or 021-555-01234 or 10.0.0.1") ===
      Seq("[EMAIL] or [PHONE] or [IP]"))
    val clean = "no personal data here, just words and 42 numbers"
    assert(scrub(clean) === Seq(clean))
  }

  test("email is redacted before the digit patterns can bite into it") {
    // a digits-heavy address: if phone ran first it could consume the
    // local part and leave a mangled address behind
    assert(scrub("reach 0123456789@relay.example.org") === Seq("reach [EMAIL]"))
  }

  test("benign numeric prose survives the phone pattern") {
    val ranges = "pages 100 - 200 of the report, figure 3, 42 items"
    assert(scrub(ranges) === Seq(ranges))
  }

  private def counts(text: String): (Long, Long, Long) = {
    import spark.implicits._
    val row = Seq(text).toDF("text")
      .select(TextAnalysis.piiCounts(col("text")): _*)
      .collect()(0)
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }

  test("counts match the redactions") {
    assert(counts("a@b.co and c@d.org meet at 10.0.0.1") === ((2L, 0L, 1L)))
    // sequential semantics: the digits inside the email are never also
    // billed as a phone, because phone counts on the post-email text
    assert(counts("reach 0123456789@relay.example.org") === ((1L, 0L, 0L)))
    assert(counts("call 021-555-0199 or +27 (0)21 555 0199") === ((0L, 2L, 0L)))
  }
}
