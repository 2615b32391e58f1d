package graft

import org.apache.spark.sql.functions._
import graft.operators.{Interlace, Rolling}

class RollingInterlaceQuirkSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("trailing window counts only the last k days per key") {
    val ev = Seq(
      (1L, d("2024-01-01"), 100L), (1L, d("2024-01-03"), 100L),
      (1L, d("2024-01-09"), 100L), // 8 days after the first
      (2L, d("2024-01-01"), 50L)
    ).toDF("u", "day", "cents")
    val out = Rolling.trailing(ev, "u", "day", col("cents"), days = 7)
      .select("u", "date", "n_7d", "cents_7d")
      .as[(Long, java.sql.Date, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, d("2024-01-01"), 1L, 100L),
      (1L, d("2024-01-03"), 2L, 200L), // Jan 1 within 7 days
      (1L, d("2024-01-09"), 2L, 200L), // Jan 1 aged out, Jan 3 remains
      (2L, d("2024-01-01"), 1L, 50L)))
  }

  test("truncateOne reproduces the reference CASE quirk for open secondaries") {
    // secondary open-ended (valid_until NULL): the CASE translation of the
    // reference's ifelse (R/truncate_interlace.R:109-112) yields NULL —
    // the truncated interval inherits the OPEN end, not the primary's.
    val primary = Seq((1L, "ep", d("2020-01-01"), d("2020-02-01")))
      .toDF("key_k", "episode", "valid_from", "valid_until")
    val secondary = Seq((1L, "attr", d("2019-01-01"),
        Option.empty[java.sql.Date]))
      .toDF("key_k", "a", "valid_from", "valid_until")
    val out = Interlace.truncateOne(primary, secondary, Seq("key_k"))
      .select("valid_from", "valid_until")
      .as[(java.sql.Date, Option[java.sql.Date])].head()
    assert(out == (d("2020-01-01"), None))
  }
}
