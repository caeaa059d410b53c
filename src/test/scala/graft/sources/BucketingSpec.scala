package graft.sources

import java.nio.file.Files

import graft.SparkSuite

class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("same-bucketed tables join without any shuffle exchange") {
    val root = Files.createTempDirectory("graft-bucket").toString
    val fact = (1 to 1000).map(i => (i.toLong % 50, s"row$i")).toDF("key", "payload")
    val dim = (0L until 50L).map(k => (k, s"dim$k")).toDF("key", "name")
    Bucketing.writeBucketed(fact, "b_fact", "key", 8, s"$root/fact")
    Bucketing.writeBucketed(dim, "b_dim", "key", 8, s"$root/dim")
    // force a sort-merge join so a shuffle would be visible if required
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "b_fact", "b_dim", "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() === 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_fact")
      spark.sql("DROP TABLE IF EXISTS b_dim")
    }
  }
}
