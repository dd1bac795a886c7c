package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * The reference processes opaque binary payloads per message
  * (`lib/src/klio/transforms/decorators.py`); a Spark-native engine instead
  * exposes text ops as composable `Column` expressions so they stay inside
  * whole-stage codegen — no UDF/serialization boundary per row, which is the
  * difference between "works" and "works on 100 TB".
  *
  * Everything here is built from Spark's higher-order functions
  * (`transform`/`aggregate`/`filter`) over arrays: codegen'd, null-safe,
  * and exactly reproducible in the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokenization; null/empty/blank text → empty array (a null
    * here would poison every size()-derived count downstream with -1).
    */
  def tokens(c: Column): Column = {
    val t = trim(coalesce(c, lit("")))
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Okapi BM25 per-term contribution on a 1e-7 fixed-point grid, as a
    * LONG: idf kept RATIONAL (N/df — no libm log whose last ulp could
    * differ across engines), tf saturation k1=1.2, length normalization
    * b=0.75, the per-term double floored to an integer so per-doc SUMs
    * are independent of partial-aggregation order. The parenthesization
    * is ORACLE-PINNED — every DuckDB oracle replays this exact
    * expression tree (IEEE +,-,*,/ are deterministic cross-engine only
    * when the tree shape matches), so t23/t24/s12 all score through
    * this ONE definition and cannot drift from each other.
    */
  def bm25Fp(tf: Column, df: Column, dl: Column, nDocs: Long,
      avgdl: Double): Column =
    floor(
      (lit(nDocs).cast("double") / df) * (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) +
          lit(0.75) * (dl.cast("double") / lit(avgdl)))) * lit(1e7))
      .cast("long")

  /** Distinct-token (type) count — type/token ratio is a standard
    * repetitiveness quality signal.
    */
  def typeCount(c: Column): Column = size(array_distinct(tokens(c)))

  /** Total characters across tokens (exact integer, oracle-reproducible). */
  def tokenCharCount(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, t) => acc + length(t).cast("long"))

  /** How many tokens fall in `words` — stopword density, language evidence. */
  def stopwordCount(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(words)))

  /** BPE-ish subword count: alpha runs, digit runs, and single punctuation
    * marks each count as one token (a cheap, deterministic proxy for a real
    * BPE vocab — same regex the oracle uses).
    */
  def subwordCount(c: Column): Column =
    size(call_function("regexp_extract_all", coalesce(c, lit("")),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  val HashMod = 1000000007L
  val HashBase = 31L

  /** Polynomial rolling hash of the whole string (mod 1e9+7, base 31).
    * Document fingerprinting primitive; fold stays in codegen via
    * `aggregate`. First step (0*31+c) == c, matching a fold without an
    * initial accumulator — which is what the DuckDB oracle's `list_reduce`
    * computes.
    */
  def rollingHash(c: Column): Column =
    aggregate(
      transform(call_function("regexp_extract_all", c, lit("."), lit(0)),
        ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * HashBase + x) % HashMod)

  /** Overlapping character n-grams (shingles) as an array column. */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(c) - (n - 1)),
        i => c.substr(i, lit(n))))

  /** Distinct character n-grams — the shingle set for Jaccard/MinHash. */
  def shingles(c: Column, n: Int): Column = array_distinct(charNgrams(c, n))

  /** Word bigrams ("a b") — n-gram language-model / frequency primitive.
    * Fewer than two tokens (blank/one-word text) → empty array; without the
    * guard `slice` would get a negative length and throw on empty docs.
    */
  def wordBigrams(c: Column): Column = {
    val t = tokens(c)
    when(size(t) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
  }

  /** Stopword lists for the language-ID heuristic (function words; a
    * document's argmax list wins, ties resolved en > de > fr > es).
    */
  val StopEn = Seq("the", "a", "of", "and", "is", "to", "in", "that", "it", "on")
  val StopDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "im")
  val StopFr = Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour")
  val StopEs = Seq("el", "los", "las", "es", "y", "uno", "una", "en", "por", "como")

  /** n-gram/stopword language-ID heuristic → 'en'|'de'|'fr'|'es'|'und'. */
  def langId(c: Column): Column = {
    val cEn = stopwordCount(c, StopEn)
    val cDe = stopwordCount(c, StopDe)
    val cFr = stopwordCount(c, StopFr)
    val cEs = stopwordCount(c, StopEs)
    when(cEn === 0 && cDe === 0 && cFr === 0 && cEs === 0, "und")
      .when(cEn >= cDe && cEn >= cFr && cEn >= cEs, "en")
      .when(cDe >= cFr && cDe >= cEs, "de")
      .when(cFr >= cEs, "fr")
      .otherwise("es")
  }

  // PII scrubbing (training-data pipeline surface): regex-based
  // redaction of the high-frequency identifier classes. regexp_replace
  // is codegen'd — a per-row scan, no shuffle, linear at 100 TB.
  // Email before IP before phone: an all-digit pattern applied first
  // would eat the octets of an IPv4 or the local part of an address.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d{1,3}[- .]?\\(?\\d{3}\\)?[- .]?\\d{3}[- .]?\\d{4}"

  /** Redact emails, IPv4 addresses, and phone numbers with typed
    * placeholders — the scrub step before near-dup/quality filtering in
    * a training-data pipeline.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-class PII match counts (audit/reporting side of the scrub).
    * Each class counts on text with the PRIOR classes blanked — the same
    * precedence as [[redactPii]] — so counts reconcile exactly with the
    * number of placeholders the scrub emits (an IP inside an email's
    * domain is one email, zero IPs, in both).
    */
  def piiCounts(c: Column): Column = {
    val afterEmail = regexp_replace(c, EmailRe, " ")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, " ")
    struct(
      size(call_function("regexp_extract_all", c, lit(EmailRe), lit(0)))
        .as("emails"),
      size(call_function("regexp_extract_all", afterEmail, lit(Ipv4Re),
        lit(0))).as("ips"),
      size(call_function("regexp_extract_all", afterIp, lit(PhoneRe),
        lit(0))).as("phones"))
  }

  /** DSIR feature buckets: every char-trigram hashed to 1024 buckets by
    * the minhash family's base-31 polynomial, one primitive pass per
    * document (the SQL-expression form pays O(position) per
    * `substring`, O(len²) per doc — the same trap
    * [[graft.functions.DedupFunctions.shinglesPacked3]] documents).
    * With multiplicity: the importance score weights occurrences, not
    * the distinct set.
    */
  val dsirBuckets: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((text: String) => {
      if (text == null || text.length < 3) Array.empty[Int]
      else {
        val n = text.length - 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = ((text.charAt(i).toInt * 31 +
            text.charAt(i + 1).toInt) * 31 +
            text.charAt(i + 2).toInt) % 1024
          i += 1
        }
        out
      }
    })

  /** Unicode cleanup for ingest normalization — the first pass every
    * text-curation pipeline runs so that downstream exact/near dedup
    * and tokenization see ONE canonical byte form of equal text: NFC
    * canonical composition (`java.text.Normalizer` — same Unicode
    * tables DuckDB's `nfc_normalize` implements, probed equal on
    * decomposed accents / ring / ligature / ZWSP cases), then strip
    * zero-width format characters (ZWSP/ZWNJ/ZWJ/BOM — invisible dedup
    * poison), then collapse ASCII whitespace runs and trim. Pure
    * per-row projection: no shuffle, order pinned so an oracle replays
    * it step for step.
    */
  val nfcClean: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((text: String) => {
      if (text == null) null
      else {
        val nfc = java.text.Normalizer.normalize(text,
          java.text.Normalizer.Form.NFC)
        val sb = new java.lang.StringBuilder(nfc.length)
        var i = 0
        var inWs = false
        while (i < nfc.length) {
          val c = nfc.charAt(i)
          if (c == '\u200B' || c == '\u200C' || c == '\u200D' ||
              c == '\uFEFF') () // zero-width: drop
          else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
            if (!inWs) sb.append(' ')
            inWs = true
          } else {
            sb.append(c)
            inWs = false
          }
          i += 1
        }
        sb.toString.trim
      }
    })

  /** Script census per document — the multilingual-curation signal
    * language-ID alone misses (a "Russian" doc that is 80% Latin
    * code, mixed-script spam, mojibake): counts of codepoints per
    * Unicode script class (Latin letters, Cyrillic, Greek, CJK
    * unified ideographs, digits, everything else) in one pass. Range
    * checks only — no locale tables — so an oracle replays them as
    * plain comparisons.
    */
  val scriptCounts: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((text: String) => {
      var latin = 0L; var cyr = 0L; var greek = 0L
      var cjk = 0L; var digit = 0L; var other = 0L
      if (text != null) {
        var i = 0
        while (i < text.length) {
          val cp = text.codePointAt(i)
          if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z'))
            latin += 1
          else if (cp >= 0x0400 && cp <= 0x04FF) cyr += 1
          else if (cp >= 0x0370 && cp <= 0x03FF) greek += 1
          else if (cp >= 0x4E00 && cp <= 0x9FFF) cjk += 1
          else if (cp >= '0' && cp <= '9') digit += 1
          else other += 1
          i += Character.charCount(cp)
        }
      }
      (latin, cyr, greek, cjk, digit, other)
    })
}
