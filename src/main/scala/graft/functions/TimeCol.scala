package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Timestamp-flavor tolerance for the time family.
  *
  * Parquet writers flip between instant (`isAdjustedToUTC=true` →
  * Spark TIMESTAMP) and wall-clock (`isAdjustedToUTC=false` →
  * TIMESTAMP_NTZ) encodings of the same values; several time
  * functions (`unix_micros`, `window(...).start.cast("long")`) accept
  * only the instant flavor and fail ANALYSIS on NTZ — which is how a
  * testdata regeneration once broke eight queries while every
  * literal-frame unit test stayed green. Operators that do timestamp
  * arithmetic normalize their ts column through [[instant]] first, so
  * the engine tolerates either flavor regardless of which loader the
  * caller used. Every entry point pins
  * `spark.sql.session.timeZone=UTC`, making the NTZ→TIMESTAMP cast
  * value-preserving (same micros-since-epoch bits).
  */
object TimeCol {

  /** Return `df` with `tsCol` cast to instant TIMESTAMP if it arrived
    * as TIMESTAMP_NTZ; any other type passes through untouched (a
    * no-op projection Catalyst collapses). */
  def instant(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case TimestampNTZType => df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _                => df
    }
}
