package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** MLlib pipeline integration: a trainable document-quality classifier
  * over the engine's text signals — the ML-side consumer of the feature
  * store's columns. The heuristic `TextAnalysis.qualityScore` provides
  * weak labels; the model learns to reproduce the judgement from
  * signals only (the score itself is NOT a feature), which is the
  * standard weak-supervision bootstrap for corpus filtering at scale —
  * label a sliver with the expensive heuristic, apply the cheap learned
  * model to everything.
  *
  * Everything is a standard `org.apache.spark.ml.Pipeline`
  * (VectorAssembler → StandardScaler → LogisticRegression), so the
  * fitted model serializes with `.save`, scores with `.transform`, and
  * composes with any downstream MLlib stage.
  */
object Quality {

  val FeatureCols: Seq[String] =
    Seq("n_words", "n_punct", "stop_ratio", "mean_word_len", "digit_ratio")

  /** Per-document signal frame (all codegen'd column expressions). */
  def signals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    df.select(col(idCol),
      TextAnalysis.wsTokenCount(text).cast("double").as("n_words"),
      TextAnalysis.punctCount(text).cast("double").as("n_punct"),
      TextAnalysis.stopwordRatio(text).as("stop_ratio"),
      (length(regexp_replace(text, "\\s+", "")).cast("double") /
        greatest(TextAnalysis.wsTokenCount(text), lit(1)).cast("double"))
        .as("mean_word_len"),
      (size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("double") /
        greatest(length(text), lit(1)).cast("double")).as("digit_ratio"),
      TextAnalysis.qualityScore(text).as("quality"))
  }

  def pipeline(): Pipeline = new Pipeline().setStages(Array(
    new VectorAssembler().setInputCols(FeatureCols.toArray)
      .setOutputCol("raw_features"),
    new StandardScaler().setInputCol("raw_features")
      .setOutputCol("features"),
    new LogisticRegression().setLabelCol("label")
      .setFeaturesCol("features").setMaxIter(25).setRegParam(0.01)))

  /** Fit on weak labels: quality ≥ `tau` ⇒ positive. */
  def trainWeak(df: DataFrame, idCol: String, textCol: String,
                tau: Double): PipelineModel = {
    val train = signals(df, idCol, textCol)
      .withColumn("label", (col("quality") >= tau).cast("double"))
    pipeline().fit(train)
  }

  /** Score a corpus: (id, p_good, prediction). */
  def score(model: PipelineModel, df: DataFrame, idCol: String,
            textCol: String): DataFrame =
    model.transform(signals(df, idCol, textCol))
      .select(col(idCol),
        element_at(vector_to_array(col("probability")), 2).as("p_good"),
        col("prediction"))

  private def vector_to_array(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.vector_to_array(c)
}
