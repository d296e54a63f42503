package graft

import org.apache.spark.sql.functions._
import graft.operators.Parse

/** Pins the symbol→expiry parser against the reference's rules
  * (main.py:131-138,177-190): ≥4 dash-parts, last token exactly 6 digits,
  * DDMMYY with year = 2000 + YY, malformed → NULL (row dropped downstream).
  */
class ParseSpec extends SparkSpec {
  import spark.implicits._

  private def parse(symbols: String*): Seq[Option[String]] =
    symbols.toDF("symbol")
      .select(Parse.expiryFromSymbol(col("symbol")).cast("string").as("d"))
      .collect()
      .map(r => Option(r.getString(0)))
      .toSeq

  test("valid symbol parses DDMMYY with year 2000+YY") {
    assert(parse("C-ETH-3500-171025") === Seq(Some("2025-10-17")))
    // YY=95 → 2095 (fixed 2000+YY rule, NOT the POSIX 69-pivot)
    assert(parse("P-ETH-100-010195") === Seq(Some("2095-01-01")))
  }

  test("fewer than 4 dash-parts is rejected") {
    assert(parse("ETH-3500-171025") === Seq(None))
  }

  test("expiry token must be exactly 6 digits") {
    assert(parse("C-ETH-3500-1710251") === Seq(None))
    assert(parse("C-ETH-3500-17102") === Seq(None))
    assert(parse("C-ETH-3500-17OCT5") === Seq(None))
  }

  test("calendar-invalid dates are rejected, not errors") {
    assert(parse("C-ETH-3500-310225") === Seq(None)) // Feb 31
    assert(parse("C-ETH-3500-001025") === Seq(None)) // day 0
  }

  test("option type CASE matches reference main.py:196") {
    val r = Seq("call_options", "put_options", "weird")
      .toDF("ct")
      .select(Parse.optionType(col("ct")))
      .collect()
      .map(_.getString(0))
      .toSeq
    assert(r === Seq("Call", "Put", "Put"))
  }

  test("snapshot-side mark_price: absent → 0, unparseable → NULL drop marker (main.py:197,220-223)") {
    val r = Seq[Option[String]](None, Some("1.5"), Some("abc"), Some(""), Some("2"))
      .toDF("m")
      .select(Parse.markPriceOrDrop(col("m")).as("v"))
      .collect()
      .map(x => if (x.isNullAt(0)) None else Some(x.getDouble(0)))
      .toSeq
    assert(r === Seq(Some(0.0), Some(1.5), None, None, Some(2.0)))
  }

  test("snapshot-side oi_contracts: absent → 0, int() strictness rejects '12.5' (main.py:198)") {
    val r = Seq[Option[String]](None, Some("42"), Some("12.5"), Some(" 7 "), Some("-3"), Some("x"))
      .toDF("o")
      .select(Parse.oiContractsOrDrop(col("o")).as("v"))
      .collect()
      .map(x => if (x.isNullAt(0)) None else Some(x.getLong(0)))
      .toSeq
    assert(r === Seq(Some(0L), Some(42L), None, Some(7L), Some(-3L), None))
  }

  test("firstSpot takes first castable spot in arrival order (main.py:112-116)") {
    val raw = Seq(
      ("A", "x", 2L), ("B", "123.5", 3L), ("C", "99.0", 1L), ("D", null, 4L)
    ).toDF("symbol", "spot_price", "src_seq")
    assert(Parse.firstSpot(raw) === Some(99.0))
    val none = Seq(("A", "x", 1L)).toDF("symbol", "spot_price", "src_seq")
    assert(Parse.firstSpot(none) === None)
  }
}
