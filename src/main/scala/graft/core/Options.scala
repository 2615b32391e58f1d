package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Scoped store configuration (reference: R/0_R6_utils.R:78-158
  * `diseasyoption`). Options live in Spark's runtime SQL conf under the
  * `graft.` namespace — store-specific keys
  * (`graft.<StoreName>.<option>`) take precedence over general ones
  * (`graft.<option>`), then a caller default. The Spark conf is the
  * idiomatic carrier: it serializes to executors, is settable per
  * session (`spark.conf.set`) or at submit time (`--conf`), and needs no
  * extra config machinery.
  *
  * Empty-string values count as unset (the reference discards `""` and
  * `NULL` options before resolving precedence).
  */
object Options {

  val Namespace = "graft"

  private def nonEmpty(v: Option[String]): Option[String] =
    v.filter(_.nonEmpty)

  /** Most-specific non-empty value for `option`: store-scoped key first,
    * then general, then `default`. `store` is canonicalized with
    * `Registry.toStoreCase`, so labels ("google covid19") and class
    * names both address the same scope. */
  def get(spark: SparkSession, option: String, store: String = "",
          default: String = null): Option[String] = {
    val scopes =
      (if (store.nonEmpty)
        Seq(s"$Namespace.${graft.stores.Registry.toStoreCase(store)}.$option")
      else Seq.empty) :+ s"$Namespace.$option"
    scopes.iterator
      .map(k => nonEmpty(spark.conf.getOption(k)))
      .collectFirst { case Some(v) => v }
      .orElse(Option(default))
  }

  def millis(spark: SparkSession, option: String, store: String,
             default: Long): Long =
    get(spark, option, store).map(_.toLong).getOrElse(default)

  /** All options visible to a store: every general `graft.<option>` plus
    * every `graft.<Store>.<option>`, with the specific value replacing a
    * general one of the same option name (reference's no-option branch:
    * class-specific options overwrite general ones). Keys are returned
    * option-name-only. */
  def scoped(spark: SparkSession, store: String): Map[String, String] = {
    val prefix = s"$Namespace."
    val storeName = graft.stores.Registry.toStoreCase(store)
    val all = spark.conf.getAll.filter { case (k, v) =>
      k.startsWith(prefix) && v.nonEmpty
    }
    val general = all.collect {
      case (k, v) if k.stripPrefix(prefix).matches("""\w+""") =>
        k.stripPrefix(prefix) -> v
    }
    val specific = all.collect {
      case (k, v) if k.startsWith(s"$prefix$storeName.") &&
          k.stripPrefix(s"$prefix$storeName.").matches("""\w+""") =>
        k.stripPrefix(s"$prefix$storeName.") -> v
    }
    general ++ specific
  }
}

/** Existence-aware pick (reference: R/grapes-.-grapes.R `%.%`): fetching
  * a column that does not exist is an immediate, named error instead of
  * an AnalysisException deep in a plan. */
object Pluck {
  def apply(df: DataFrame, field: String): Column =
    if (df.columns.contains(field)) df(field)
    else throw new IllegalArgumentException(
      s"$field not found in DataFrame(${df.columns.mkString(", ")})")

  def apply(m: Map[String, String], field: String): String =
    m.getOrElse(field, throw new IllegalArgumentException(
      s"$field not found in ${m.keys.mkString("{", ", ", "}")}"))
}
