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
  }
}
