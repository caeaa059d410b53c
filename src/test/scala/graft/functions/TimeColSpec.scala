package graft.functions

import java.time.{Instant, LocalDateTime, ZoneOffset}

import graft.SparkSuite
import graft.operators.Windows
import graft.streaming.Sessions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The round-7 incident class: a parquet regeneration flipped
  * events.ts to TIMESTAMP_NTZ and broke every ts-arithmetic operator
  * at analysis time. These tests drive the time family directly on an
  * NTZ frame and require bit-identical results to the instant frame.
  */
class TimeColSpec extends SparkSuite {
  import spark.implicits._

  // the same five (event_id, ts, user_id, event_type, value) rows in
  // both timestamp flavors; session TZ is pinned UTC so the flavors
  // denote the same micros-since-epoch values
  private val epochs = Seq(0L, 120L, 300L, 660L, 3600L)
  private def instantDf: DataFrame =
    epochs.zipWithIndex.map { case (s, i) =>
      (i.toLong, Instant.ofEpochSecond(s).atZone(ZoneOffset.UTC).toLocalDateTime, 1L, if (i % 2 == 0) "click" else "view", i * 1.5)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
  private def ntzDf: DataFrame =
    epochs.zipWithIndex.map { case (s, i) =>
      (i.toLong, LocalDateTime.ofEpochSecond(s, 0, ZoneOffset.UTC), 1L, if (i % 2 == 0) "click" else "view", i * 1.5)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("the two fixture flavors really are TIMESTAMP vs TIMESTAMP_NTZ") {
    assert(instantDf.schema("ts").dataType === TimestampType)
    assert(ntzDf.schema("ts").dataType === TimestampNTZType)
  }

  test("instant() casts NTZ to TIMESTAMP and leaves other types alone") {
    assert(TimeCol.instant(ntzDf).schema("ts").dataType === TimestampType)
    val untouched = TimeCol.instant(instantDf)
    assert(untouched.schema("ts").dataType === TimestampType)
    assert(untouched.collect() === instantDf.collect())
  }

  test("window/session/unix_micros operators accept NTZ and match the instant result") {
    val pairs: Seq[(String, DataFrame => DataFrame)] = Seq(
      "windowedCounts" -> (df => Sessions.windowedCounts(df)),
      "windowedDistinct" -> (df => Sessions.windowedDistinct(df)),
      "slidingCounts" -> (df => Sessions.slidingCounts(df)),
      "sessionize" -> (df => Sessions.sessionize(df)),
      "movingStats" -> (df => Windows.movingStats(df)),
      "transitions" -> (df => Windows.transitions(df)),
      "timeWeighted" -> (df => Windows.timeWeighted(df)))
    pairs.foreach { case (name, op) =>
      val viaNtz = op(ntzDf).collect().toSeq
      val viaInstant = op(instantDf).collect().toSeq
      assert(viaNtz === viaInstant, s"$name diverges between timestamp flavors")
      assert(viaNtz.nonEmpty, s"$name returned no rows")
    }
  }
}
