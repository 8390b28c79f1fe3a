package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** t05 masking semantics on adversarial fixtures. The load-bearing
  * rule: a 16-digit CANDIDATE masks only when its Luhn checksum
  * verifies — valid-format/invalid-Luhn numbers must survive (the
  * over-redaction failure), and the checksum must accept real-world
  * valid numbers (4111111111111111, the canonical test PAN). */
class PiiMaskSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(raw: String) =
    TextAnalysis.piiMask(Seq((1L, raw)).toDF("c_custkey", "raw")).collect()(0)

  test("luhn-valid card masks, invalid-format survives, invalid-checksum survives") {
    // 4111111111111111 is Luhn-valid; flipping the last digit breaks it.
    val r = one("pay 4111111111111111 or 4111111111111112 or 411111111111111 ok")
    assert(r.getAs[String]("masked") ==
      "pay [CARD] or 4111111111111112 or 411111111111111 ok")
    assert(r.getAs[Long]("n_cards") == 2L)
    assert(r.getAs[Long]("n_cards_valid") == 1L)
  }

  test("email, phone, ipv4 mask by pattern; counts audit each class") {
    val r = one("mail a.b@x.io call 555-123-4567 from 10.0.255.7 now")
    assert(r.getAs[String]("masked") == "mail [EMAIL] call [PHONE] from [IP] now")
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_phones") == 1L)
    assert(r.getAs[Long]("n_ips") == 1L)
    assert(r.getAs[Long]("n_cards") == 0L)
  }

  test("17-digit runs and digit runs embedded in words are not candidates") {
    val r = one("id 41111111111111110 and 4111111111111111x4111111111111111 w 4111111111111111.")
    // \b[0-9]{16}\b: the 17-digit run has no boundary split, and a
    // letter flanking a digit is NOT a word boundary (both are word
    // chars) — only the standalone run (punctuation/space-delimited)
    // is a candidate.
    assert(r.getAs[String]("masked") ==
      "id 41111111111111110 and 4111111111111111x4111111111111111 w [CARD].")
    assert(r.getAs[Long]("n_cards") == 1L)
  }

  test("t05 production: even custkeys carry valid cards (masked), odd invalid (kept)") {
    val out = Queries.production("t05_pii_mask")(spark, sf001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val even = r.getAs[Long]("c_custkey") % 2 == 0
      assert(r.getAs[Long]("n_cards") == 1L)
      assert(r.getAs[Long]("n_cards_valid") == (if (even) 1L else 0L))
      assert(r.getAs[String]("masked").contains("[CARD]") == even,
        s"custkey ${r.getAs[Long]("c_custkey")}: Luhn mask must track planted validity")
      assert(r.getAs[String]("masked").contains("[IP]") &&
        r.getAs[String]("masked").contains("[EMAIL]") &&
        r.getAs[String]("masked").contains("[PHONE]"))
    }
  }
}
