package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per `sbt test`). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session

  /** Run `body` with the given SQL confs set, restoring prior values
    * after (the session is shared across suites, so leaks would bleed
    * into other tests). */
  def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}

object SparkSuite {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // graft buckets tables DELIBERATELY (pruned index probes, co-located
    // joins); the auto rule would silently drop SelectedBucketsCount
    // pruning on probe-only plans (filter on the bucket key, no join/agg)
    .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
