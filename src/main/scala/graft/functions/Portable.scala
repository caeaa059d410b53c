package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hash spellings shared across operators. These are
  * load-bearing for the DuckDB oracle gate: every module that
  * fingerprints values must use the SAME expression as the oracle SQL
  * (`('0x' || substr(md5(x), 1, 15))::BIGINT`), so the spelling lives
  * in exactly one place.
  */
object Portable {

  /** 60-bit engine-portable value fingerprint: 15 hex digits of md5 —
    * 16 could exceed signed-long range in engines parsing signed hex.
    * Injective string render first (a no-op Cast on string columns,
    * removed by SimplifyCasts), so any input type fingerprints its
    * distinct values. */
  def fp60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
}
