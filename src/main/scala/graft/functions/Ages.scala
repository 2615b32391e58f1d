package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Age arithmetic + sortable age-group labels
  * (reference: R/age_helpers.R:8-21 `age_labels`, :42-91 `age_on_date`,
  * :112-156 `add_years`).
  *
  * All of these are plain codegen'd column expressions — no UDFs.
  *
  * Semantics: exact calendar age; a Feb-29 birthday increments on Mar 1
  * in non-leap years (the reference's backends disagree among themselves
  * here — SQLite is approximate, DuckDB clamps to Feb 28; we pick the
  * month/day-comparison definition and keep it engine-reproducible).
  */
object Ages {

  /** Whole years elapsed from `birth` to `ref`. */
  def ageOnDate(birth: Column, ref: Column): Column =
    (year(ref) - year(birth) -
      when(month(ref) * 100 + dayofmonth(ref) <
           month(birth) * 100 + dayofmonth(birth), 1).otherwise(0)
    ).cast("int")

  /** `date` shifted by `years` whole years (Feb 29 clamps to Feb 28). */
  def addYears(date: Column, years: Column): Column =
    add_months(date, years * 12)

  /** Zero-padded sortable labels for age groups with lower bounds
    * `cuts` (0 implicit): ageLabels(Seq(5,12)) == Seq("00-04","05-11","12+"). */
  def ageLabels(cuts: Seq[Int]): Seq[String] = {
    require(cuts == cuts.sorted && cuts.distinct == cuts && cuts.forall(_ > 0),
      "cuts must be positive, strictly increasing")
    val width = math.max(1, cuts.lastOption.map(_.toString.length).getOrElse(1))
    def pad(i: Int): String = i.toString.reverse.padTo(width, '0').reverse
    val lowers = 0 +: cuts
    lowers.zipWithIndex.map { case (lo, i) =>
      if (i == lowers.size - 1) pad(lo) + "+"
      else pad(lo) + "-" + pad(lowers(i + 1) - 1)
    }
  }

  /** Bucket an age column into the labels of `ageLabels(cuts)`. */
  def cutAges(age: Column, cuts: Seq[Int]): Column = {
    val labels = ageLabels(cuts)
    val branches = cuts.zip(labels.init).foldLeft(Option.empty[Column]) {
      case (acc, (cut, label)) =>
        val c = when(age < cut, label)
        Some(acc.fold(c)(a => a.when(age < cut, label)))
    }
    branches.map(_.otherwise(labels.last)).getOrElse(lit(labels.last))
  }
}
