package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** tx_pii's detection/redaction signal on constructed documents — the
  * synthetic corpus contains no PII-shaped strings, so the oracle gate
  * proves only the (trivially clean) end-to-end chain; this spec proves
  * the patterns fire, mask, and compose in the declared order.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: (Long, String)*) =
    TextOps.piiProject(texts.toDF("doc_id", "text"))
      .orderBy(col("doc_id"))
      .collect()

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("each pattern class detects, counts, and masks") {
    val rows = run(
      (0L, "mail me at jane.doe+x@example.co.uk today"),
      (1L, "see https://example.com/a?b=c and http://x.io"),
      (2L, "server at 10.0.0.1 and 192.168.254.3"),
      (3L, "call +1 555-867-5309 or 0044 20 7946 0958"))
    val expected = Seq(
      // (n_url, n_email, n_ip, n_phone, redacted)
      (0L, 1L, 0L, 0L, "mail me at <EMAIL> today"),
      (2L, 0L, 0L, 0L, "see <URL> and <URL>"),
      (0L, 0L, 2L, 0L, "server at <IP> and <IP>"),
      (0L, 0L, 0L, 2L, "call <PHONE> or <PHONE>"))
    rows.zip(expected).foreach { case (r, (u, e, i, p, red)) =>
      assert(r.getAs[Long]("n_url") == u, r.toString)
      assert(r.getAs[Long]("n_email") == e, r.toString)
      assert(r.getAs[Long]("n_ip") == i, r.toString)
      assert(r.getAs[Long]("n_phone") == p, r.toString)
      assert(r.getAs[Long]("n_pii") == u + e + i + p)
      assert(r.getAs[Long]("red_chars") == red.length.toLong)
      assert(r.getAs[String]("red_fp") == md5Hex(red), r.toString)
    }
  }

  test("application order: an email inside a URL redacts as the URL") {
    val Array(r) = run((0L, "https://a.b/mailto/jane@x.com stays jane@x.com"))
    assert(r.getAs[Long]("n_url") == 1L)
    assert(r.getAs[Long]("n_email") == 1L) // only the free-standing one
    assert(r.getAs[String]("red_fp") == md5Hex("<URL> stays <EMAIL>"))
  }

  test("application order: dotted quads never re-match as phone digit runs") {
    val Array(r) = run((0L, "ping 10.20.30.40 now"))
    assert(r.getAs[Long]("n_ip") == 1L)
    assert(r.getAs[Long]("n_phone") == 0L)
    assert(r.getAs[String]("red_fp") == md5Hex("ping <IP> now"))
  }

  test("date-like and ID-like digit runs are not phones") {
    val rows = run(
      (0L, "released 2026-01-01 and updated 1999-12-31"),
      (1L, "series 10 20 30 40 50 continues"),
      (2L, "order 123456 shipped"),
      (3L, "trace 1234567890123456789 logged"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_phone") == 0L, r.toString)
      assert(r.getAs[Long]("n_pii") == 0L, r.toString)
    }
  }

  test("phone shapes still fire: local, bare-run, grouped, international") {
    val rows = run(
      (0L, "call 555-8675 today"),
      (1L, "fax 5551234567 now"),
      (2L, "dial 555-867-5309 or 0151-496-0780"),
      (3L, "intl +44 20 7946 0958"))
    val expected = Seq(1L, 1L, 2L, 1L)
    rows.zip(expected).foreach { case (r, p) =>
      assert(r.getAs[Long]("n_phone") == p, r.toString)
    }
  }

  test("clean text passes through byte-identical with zero counts") {
    val clean = "no personal data here, just words and 42 digits"
    val Array(r) = run((0L, clean))
    assert(r.getAs[Long]("n_pii") == 0L)
    assert(r.getAs[String]("red_fp") == md5Hex(clean))
  }
}
