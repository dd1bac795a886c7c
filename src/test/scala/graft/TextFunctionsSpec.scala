package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.functions.DedupFunctions._

/** Edge-case behavior of the text/dedup column functions — notably blank
  * and single-token documents, which reach every corpus at scale.
  */
class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wordBigrams on blank / one-word / normal text") {
    val df = Seq("", "   ", "solo", "a b c").toDF("text")
    val rows = df.select(wordBigrams(col("text")).as("bg"))
      .as[Seq[String]].collect()
    assert(rows(0) === Seq.empty)
    assert(rows(1) === Seq.empty)
    assert(rows(2) === Seq.empty)
    assert(rows(3) === Seq("a b", "b c"))
  }

  test("PII redaction scrubs emails, IPs, and phones with typed tags") {
    val df = Seq(
      "contact jane.doe+x@example.co.uk or call +1 555-867-5309 now",
      "server at 192.168.1.254 responded",
      "clean text with no identifiers",
      "two mails a@b.io c@d.org and host 10.0.0.1").toDF("text")
    val out = df.select(redactPii(col("text")).as("r"),
      piiCounts(col("text")).as("c")).collect()
    assert(out(0).getString(0) === "contact <EMAIL> or call <PHONE> now")
    assert(out(1).getString(0) === "server at <IP> responded")
    assert(out(2).getString(0) === "clean text with no identifiers")
    assert(out(3).getString(0) === "two mails <EMAIL> <EMAIL> and host <IP>")
    val c0 = out(0).getStruct(1)
    assert((c0.getInt(0), c0.getInt(1), c0.getInt(2)) === ((1, 0, 1)))
    val c3 = out(3).getStruct(1)
    assert((c3.getInt(0), c3.getInt(1), c3.getInt(2)) === ((2, 1, 0)))
  }

  test("piiCounts reconcile with redaction precedence") {
    // an IP inside an email's domain is ONE email, ZERO ips — counts
    // must match the placeholders redactPii actually emits
    val df = Seq("mail a@1.2.3.4.com end").toDF("text")
    val row = df.select(redactPii(col("text")).as("r"),
      piiCounts(col("text")).as("c")).collect().head
    assert(row.getString(0) === "mail <EMAIL> end")
    val c = row.getStruct(1)
    assert((c.getInt(0), c.getInt(1), c.getInt(2)) === ((1, 0, 0)))
  }

  test("simhash over empty feature set is total but deterministic") {
    val df = Seq("", "x y").toDF("text")
    // must not throw on the empty-features row
    val out = df.select(simhash48(wordBigrams(col("text"))).as("sh"))
      .as[Long].collect()
    assert(out.length === 2)
  }

  test("tokens and shingles handle degenerate inputs") {
    val df = Seq(("", 0), ("ab", 1), ("abcd", 2)).toDF("text", "id")
    val t = df.select(tokenCount(col("text")).as("n")).as[Int].collect()
    assert(t.toSeq === Seq(0, 1, 1))
    val sh = df.select(shingles(col("text"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(sh(0) === Seq.empty) // shorter than n
    assert(sh(1) === Seq.empty)
    assert(sh(2) === Seq("abc", "bcd"))
  }
}
