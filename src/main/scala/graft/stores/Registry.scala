package graft.stores

import org.apache.spark.sql.SparkSession

import graft.core.FeatureStore

/** Label-addressed store registry — the Spark-native equivalent of the
  * reference's search-path store discovery
  * (reference: R/3_feature_store_helpers.R:7-62 `to_diseasystore_case`,
  * `available_diseasystores`, `diseasystore_exists`). Labels are
  * free-text case definitions ("TPC-H orders", "semi_agg events");
  * factories register under the canonical PascalCase name.
  */
object Registry {

  type Factory = (SparkSession, String, String) => FeatureStore

  /** "Google COVID-19" → "GoogleCovid19"-style canonicalization: split
    * on underscores/spaces/camel boundaries, title-case each word, strip
    * separators (reference: R/3_feature_store_helpers.R:7-20). */
  def toStoreCase(label: String): String =
    label
      .replace("_", " ")
      .replaceAll("(?<=[a-z])([A-Z])", " $1")
      .split("[\\s-]+")
      .filter(_.nonEmpty)
      .map(w => w.head.toUpper +: w.tail.map(_.toLower))
      .map(_.mkString)
      .mkString

  private val factories =
    scala.collection.concurrent.TrieMap.empty[String, Factory]

  def register(name: String, factory: Factory): Unit =
    factories.put(name, factory)

  def available: Seq[String] = factories.keys.toSeq.sorted

  def exists(label: String): Boolean = factories.contains(toStoreCase(label))

  /** Instantiate the store registered for `label`; error lists the
    * available stores (mirrors the reference's missing-store error). */
  def open(label: String, spark: SparkSession, sfDir: String,
           storePath: String): FeatureStore =
    factories.get(toStoreCase(label)) match {
      case Some(f) => f(spark, sfDir, storePath)
      case None => throw new IllegalArgumentException(
        s"No feature store for '$label' (→ ${toStoreCase(label)}). " +
          s"Available: ${available.mkString(", ")}")
    }

  // built-ins
  register("TpchOrders", (s, d, p) => TpchFeatureStore(s, d, p))
  register("SemiAggEvents", (s, d, p) => new SemiAggStore(s, d, p))
}
