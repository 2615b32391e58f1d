package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations.{Check, ReferencedIn, Unique}

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("each rule class counts violations exactly") {
    val df = Seq(
      (Option(1L), 5L, "A"),
      (Option(1L), 500L, "Z"), // dup key; range violation; flag violation
      (Option.empty[Long], 20L, "R"), // null key
      (Option(9L), 30L, "N") // dangling FK
    ).toDF("id", "qty", "flag")
    val dim = Seq(1L, 2L).toDF("pk")

    val out = Expectations.validate(df,
        checks = Seq(
          Expectations.notNull("id"),
          Expectations.inRange("qty", 1, 50),
          Expectations.matches("flag", "^[ARN]$"),
          Expectations.inSet("flag", Seq("A", "R", "N")),
          Check("qty_gt_flag", col("qty") > 100L)),
        uniques = Seq(Unique("id_unique", Seq("id"))),
        refs = Seq(ReferencedIn("fk_dim", "id", dim, "pk")))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

    assert(out("not_null(id)") == ((1L, 4L)))
    assert(out("in_range(qty,1,50)") == ((1L, 4L)))
    assert(out("matches(flag)") == ((1L, 4L)))
    assert(out("in_set(flag)") == ((1L, 4L)))
    assert(out("qty_gt_flag") == ((1L, 4L)))
    // count_distinct ignores the null key, so the null row counts as
    // surplus: 4 rows - distinct {1, 9} = 2 (declare NotNull to
    // locate the nulls themselves)
    assert(out("id_unique") == ((2L, 4L)))
    // FK: null is not a violation; total = non-null FKs
    assert(out("fk_dim") == ((1L, 3L)))
    assert(out.size == 7)
  }

  test("clean data yields an all-zero report; rule subsets compose") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val out = Expectations.validate(df,
        checks = Seq(Expectations.notNull("id")),
        uniques = Seq(Unique("u", Seq("id"))))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(out.values.forall(_ == 0L))
    // refs-only invocation works too
    val refOnly = Expectations.validate(df, checks = Nil,
        refs = Seq(ReferencedIn("r", "id", df.select("id"), "id")))
      .as[(String, Long, Long)].collect()
    assert(refOnly.toSeq == Seq(("r", 0L, 2L)))
    intercept[IllegalArgumentException] {
      Expectations.validate(df, Nil)
    }
  }
}
