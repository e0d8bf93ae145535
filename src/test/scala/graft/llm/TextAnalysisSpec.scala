package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Edge semantics of the redaction operator (q43): ordering of the
  * redaction chain and count correctness on adversarial inputs. */
class TextAnalysisSpec extends AnyFunSuite with SparkFixture {

  test("redaction replaces emails before digit runs, never double-counting") {
    import spark.implicits._
    val docs = Seq(
      // digits inside the email must not count as a standalone number
      (1L, "reach me at bob12345@mail99.example.com thanks"),
      // a real long number AND an email
      (2L, "card 123456789 belongs to a@b.io"),
      // short digit runs (<4) stay untouched
      (3L, "v2 release 123 of 999"),
      // nothing to redact
      (4L, "clean text only")).toDF("doc_id", "text")
    val out = TextAnalysis.withRedaction(docs, "text")
      .select("doc_id", "n_emails", "n_nums", "redacted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out(0) === ((1L, 1L, 0L, "reach me at <EMAIL> thanks")))
    assert(out(1) === ((2L, 1L, 1L, "card <NUM> belongs to <EMAIL>")))
    assert(out(2) === ((3L, 0L, 0L, "v2 release 123 of 999")))
    assert(out(3) === ((4L, 0L, 0L, "clean text only")))
  }
}
