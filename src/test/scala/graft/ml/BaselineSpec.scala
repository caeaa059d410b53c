package graft.ml

import graft.SparkSuite
import graft.sources.Tables

class BaselineSpec extends SparkSuite {

  test("baseline RF fits on sf0.001 and yields finite metrics") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val m = Baseline.fit(li, numTrees = 5)
    assert(m.nTest > 500)
    assert(m.rmse > 0 && java.lang.Double.isFinite(m.rmse))
    assert(java.lang.Double.isFinite(m.r2) && m.r2 <= 1.0)
    assert(math.abs(m.mse - m.rmse * m.rmse) < 1e-6 * m.mse, "mse == rmse^2")
    assert(m.mae > 0 && m.mae <= m.rmse, "mae is positive and never exceeds rmse")
  }

  test("evaluateAndSave publishes model_metrics.json + predictions CSV") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val out = java.nio.file.Files.createTempDirectory("graft-mleval").toString
    val m = Baseline.evaluateAndSave(li, out, numTrees = 5)
    // metrics artifact: the reference's compute_metrics key set plus
    // feature importances (reference: src/model_evaluate.py:175-254)
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "model_metrics.json"))
    Seq("\"mse\"", "\"rmse\"", "\"mae\"", "\"r2\"", "\"n_samples\"",
      "\"feature_importances\"").foreach(k => assert(json.contains(k), s"missing $k"))
    assert(json.contains(s""""n_samples": ${m.nTest}"""))
    // importances carry RESOLVED feature names (one-hot slots + nums)
    assert(json.contains("l_returnflag_oh") && json.contains("num_scaled"))
    // predictions: one header CSV with y_true,y_pred, one row per test row
    val preds = graft.sources.Lake.ingestCsv(spark, s"$out/predictions")
    assert(preds.columns.toSeq === Seq("y_true", "y_pred"))
    assert(preds.count() === m.nTest)
  }
}
