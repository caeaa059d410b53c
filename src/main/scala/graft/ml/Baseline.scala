package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.attribute.AttributeGroup
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.RandomForestRegressionModel
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.DataFrame

/** Spark ML port of the reference's sklearn baseline model
  * (reference: src/baseline_model.py:57-167, SURVEY.md §2.12 M6):
  * RandomForest regression of the claim quantity from one-hot
  * categorical + scaled numeric features. Bench-only — there is no
  * SQL oracle for a fitted model; the harness check is the metric
  * set being finite and the pipeline fitting at scale.
  *
  * Feature shape mirrors the reference (one-hot specialty/state/
  * brand-ish categoricals + scaled numerics); the distributed twist
  * is that everything runs as one `org.apache.spark.ml.Pipeline` —
  * no pandas materialization.
  */
object Baseline {

  /** Evaluation metrics, the reference's `compute_metrics` set
    * (reference: src/model_evaluate.py:175-182). */
  final case class Metrics(rmse: Double, r2: Double, nTest: Long,
                           mse: Double, mae: Double)

  /** Fitted pipeline + held-out predictions, for callers that also
    * publish artifacts ([[evaluateAndSave]]). */
  final case class Fitted(model: PipelineModel, predictions: DataFrame,
                          metrics: Metrics)

  /** Fit RF on the TPC-H-ish fact: predict l_quantity from
    * return-flag/line-status categoricals + price/discount numerics
    * (role-mapped from the reference's claims ~ specialty/state/brand
    * + cost features). */
  def fit(lineitem: DataFrame, numTrees: Int = 20, seed: Long = 42L): Metrics =
    fitModel(lineitem, numTrees, seed).metrics

  def fitModel(lineitem: DataFrame, numTrees: Int = 20, seed: Long = 42L): Fitted = {
    val data = lineitem.select("l_quantity", "l_returnflag", "l_linestatus",
      "l_extendedprice", "l_discount")
    val Array(train, test) = data.randomSplit(Array(0.8, 0.2), seed)

    val cats = Seq("l_returnflag", "l_linestatus")
    val indexers = cats.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx").setHandleInvalid("keep"))
    val encoder = new OneHotEncoder()
      .setInputCols(cats.map(c => s"${c}_idx").toArray)
      .setOutputCols(cats.map(c => s"${c}_oh").toArray)
    val numAssembler = new VectorAssembler()
      .setInputCols(Array("l_extendedprice", "l_discount")).setOutputCol("num_raw")
    val scaler = new StandardScaler().setInputCol("num_raw").setOutputCol("num_scaled")
    val assembler = new VectorAssembler()
      .setInputCols((cats.map(c => s"${c}_oh") :+ "num_scaled").toArray)
      .setOutputCol("features")
    val rf = new RandomForestRegressor()
      .setLabelCol("l_quantity").setFeaturesCol("features")
      .setNumTrees(numTrees).setSeed(seed)

    val model = new Pipeline()
      .setStages((indexers :+ encoder :+ numAssembler :+ scaler :+ assembler :+ rf).toArray)
      .fit(train)
    val pred = model.transform(test).cache()
    val eval = new RegressionEvaluator().setLabelCol("l_quantity").setPredictionCol("prediction")
    val m = Metrics(
      rmse = eval.setMetricName("rmse").evaluate(pred),
      r2 = eval.setMetricName("r2").evaluate(pred),
      nTest = pred.count(),
      mse = eval.setMetricName("mse").evaluate(pred),
      mae = eval.setMetricName("mae").evaluate(pred))
    pred.unpersist()
    Fitted(model, pred, m)
  }

  /** Per-feature importances of the fitted forest, keyed by the
    * ASSEMBLED feature names recovered from the features column's ML
    * attribute metadata (one-hot slots expand to `col_oh_<category>`
    * style names) — the Spark equivalent of sklearn's
    * `feature_names_in_` + `feature_importances_`
    * (reference: src/model_evaluate.py:142-158). */
  def featureImportances(fitted: Fitted): Seq[(String, Double)] = {
    val rf = fitted.model.stages.last.asInstanceOf[RandomForestRegressionModel]
    val group = AttributeGroup.fromStructField(fitted.predictions.schema("features"))
    val names = group.attributes match {
      case Some(attrs) => attrs.map(a => a.name.getOrElse(s"f${a.index.getOrElse(-1)}"))
      case None => (0 until rf.numFeatures).map(i => s"f$i").toArray
    }
    names.zip(rf.featureImportances.toArray).toSeq
  }

  /** Publish the reference's evaluation artifacts
    * (reference: src/model_evaluate.py:175-254 writes
    * `model_metrics.json` + `predictions.csv`; its matplotlib plots
    * are presentation tail, out of scope per SURVEY §3.3):
    * `<outDir>/model_metrics.json` with the metric set, sample count
    * and feature importances, and `<outDir>/predictions` as a
    * one-file header CSV of (y_true, y_pred). Returns the metrics. */
  def evaluateAndSave(lineitem: DataFrame, outDir: String,
                      numTrees: Int = 20, seed: Long = 42L): Metrics = {
    val fitted = fitModel(lineitem, numTrees, seed)
    val m = fitted.metrics
    graft.sources.Lake.writeCsv(
      fitted.predictions.selectExpr("l_quantity AS y_true", "prediction AS y_pred"),
      s"$outDir/predictions")
    val fi = featureImportances(fitted)
      .map { case (n, w) => s"${graft.JsonEscape(n)}: $w" }.mkString("{", ", ", "}")
    val json =
      s"""{"mse": ${m.mse}, "rmse": ${m.rmse}, "mae": ${m.mae}, "r2": ${m.r2},
         | "n_samples": ${m.nTest},
         | "feature_importances": $fi}""".stripMargin
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "model_metrics.json"), json)
    m
  }
}
