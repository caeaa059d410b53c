package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.DataFrame

/** Spark ML port of the reference's sklearn baseline model
  * (reference: src/baseline_model.py:57-167, SURVEY.md §2.12 M6):
  * RandomForest regression of the claim quantity from one-hot
  * categorical + scaled numeric features. Bench-only — there is no
  * SQL oracle for a fitted model; the harness check is the metric
  * pair (RMSE, R^2) being finite and the pipeline fitting at scale.
  *
  * Feature shape mirrors the reference (one-hot specialty/state/
  * brand-ish categoricals + scaled numerics); the distributed twist
  * is that everything runs as one `org.apache.spark.ml.Pipeline` —
  * no pandas materialization.
  */
object Baseline {

  final case class Metrics(rmse: Double, r2: Double, nTest: Long)

  /** Fit RF on the TPC-H-ish fact: predict l_quantity from
    * return-flag/line-status categoricals + price/discount numerics
    * (role-mapped from the reference's claims ~ specialty/state/brand
    * + cost features). */
  def fit(lineitem: DataFrame, numTrees: Int = 20, seed: Long = 42L): Metrics = {
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
      nTest = pred.count())
    pred.unpersist()
    m
  }
}
