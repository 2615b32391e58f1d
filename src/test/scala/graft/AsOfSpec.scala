package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("asof picks latest valid version, honors expiry and open ends") {
    val features = Seq(
      (1L, "v1", d("2020-01-01"), Option(d("2020-02-01"))),
      (1L, "v2", d("2020-02-01"), Option(d("2020-03-01"))), // then a gap
      (1L, "v3", d("2020-04-01"), Option.empty[java.sql.Date]), // open
      (2L, "w1", d("2020-01-15"), Option(d("2020-01-20")))
    ).toDF("key_k", "v", "valid_from", "valid_until")
    val probes = Seq(
      (10L, 1L, d("2019-12-31")), // before any version
      (11L, 1L, d("2020-01-01")), // inclusive start
      (12L, 1L, d("2020-02-15")), // second version
      (13L, 1L, d("2020-03-10")), // in the gap
      (14L, 1L, d("2030-01-01")), // far future, open version
      (15L, 2L, d("2020-01-20")), // exclusive end
      (16L, 3L, d("2020-01-01"))  // unknown key
    ).toDF("probe_id", "key_k", "ts")
    val out = AsOf.join(probes, features, Seq("key_k"), "ts")
      .select("probe_id", "v").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(
      10L -> None, 11L -> Some("v1"), 12L -> Some("v2"), 13L -> None,
      14L -> Some("v3"), 15L -> None, 16L -> None))
  }
}
