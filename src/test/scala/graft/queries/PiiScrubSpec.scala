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

  test("counts match the redactions") {
    import spark.implicits._
    val row = Seq("a@b.co and c@d.org meet at 10.0.0.1")
      .toDF("text")
      .select(
        TextAnalysis.PiiPatterns.map { case (name, pat) =>
          regexp_count(col("text"), lit(pat)).as(s"n_$name")
        }: _*)
      .collect()(0)
    assert(row.getInt(0) === 2) // emails
    assert(row.getInt(1) === 0) // phones
    assert(row.getInt(2) === 1) // ips
  }
}
