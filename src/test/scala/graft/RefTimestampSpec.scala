package graft

import graft.functions.RefTimestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** The fixed-layout timestamp parser/formatter must accept exactly the
  * grammar `try_to_timestamp(c, 'yyyy-MM-dd-HH.mm.ss.SSSSSS')` accepts
  * and produce the same instants; the formatter must match date_format.
  * Checked over valid, lenient-fraction, boundary, and malformed
  * inputs, plus a generated sweep. */
class RefTimestampSpec extends SparkSpec {

  private val fmt = graft.parse.FixedWidthParser.TimestampFormat

  private def both(inputs: Seq[String]): Unit = {
    import spark.implicits._
    val df = inputs.toDF("s")
    val out = df.select(
      RefTimestamp.parse_ref_timestamp(col("s")).as("fast"),
      try_to_timestamp(col("s"), lit(fmt)).cast(TimestampNTZType).as("slow")).collect()
    inputs.zip(out).foreach { case (in, r) =>
      assert(r.get(0) == r.get(1), s"parser mismatch for '$in': fast=${r.get(0)} slow=${r.get(1)}")
    }
  }

  test("agrees with try_to_timestamp on valid + lenient-fraction inputs") {
    both(Seq(
      "2020-07-09-09.59.59.993750",
      "2020-07-09-09.59.59.99375",     // F3: 5-digit fraction
      "2020-07-09-09.59.59.9",
      "1999-12-31-23.59.59.999999",
      "2000-02-29-00.00.00.000001",    // leap day
      "1970-01-01-00.00.00.000000",
      "1969-12-31-23.59.59.500000"))   // pre-epoch
  }

  test("agrees with try_to_timestamp on malformed inputs (all null)") {
    both(Seq(
      "not-a-timestamp-at-all!!!!",
      "2020-07-09 09.59.59.993750",    // wrong separator
      "2020-13-01-00.00.00.000000",    // month 13
      "2020-02-30-00.00.00.000000",    // Feb 30
      "2019-02-29-00.00.00.000000",    // non-leap Feb 29
      "2020-07-09-24.00.00.000000",    // hour 24
      "2020-07-09-09.60.59.000000",    // minute 60
      "2020-07-09-09.59.59.",          // dot, no digits
      "2020-07-09-09.59.59.9999999",   // 7 fraction digits
      "2020-07-09-09.59.59.993750 ",   // trailing space
      " 2020-07-09-09.59.59.993750",   // leading space
      "2020-07-09-09.59.5",            // truncated
      ""))
  }

  test("generated sweep: random instants round-trip and match date_format") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val micros = Seq.fill(300)(
      // 1900..2100-ish range in micros
      -2208988800000000L + (rnd.nextDouble() * 6.3e15).toLong)
    val df = micros.toDF("us").select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val out = df.select(col("ts"),
      RefTimestamp.format_ref_timestamp(col("ts")).as("fast"),
      date_format(col("ts"), fmt).as("slow"),
      RefTimestamp.parse_ref_timestamp(
        RefTimestamp.format_ref_timestamp(col("ts"))).as("rt")).collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"format mismatch at ${r.get(0)}: ${r.getString(1)} vs ${r.getString(2)}")
      assert(r.get(3) == r.get(0), s"round-trip broke at ${r.get(0)}")
    }
  }
}
