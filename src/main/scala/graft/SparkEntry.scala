package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.packs._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(CorePack, TemporalPack, LlmPack, EventsPack, StorePack, ApproxPack,
      SqlPack, ScalePack, StatsPack, RobustPack, InferencePack,
      TokenizerPack)

  /** Flagship query on sf=0.001: daily open-order prevalence
    * (key_join_features with a count aggregator). */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_prevalence")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
