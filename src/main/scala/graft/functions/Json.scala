package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Semi-structured (JSON) column parsing ([EXT]) — the events table
  * carries a JSON `props` payload, the usual shape of instrumented
  * event streams.
  *
  * Scale rules: ALWAYS an explicit schema (`from_json` with inference
  * would need an extra full pass, and silently widens types run to
  * run), parse ONCE into a struct and project fields from it (N
  * `get_json_object` calls re-parse the string N times).
  */
object Json {

  /** Parse a JSON string column against an explicit DDL schema, e.g.
    * `"k BIGINT, tags ARRAY<STRING>"`. Malformed rows yield null
    * fields (PERMISSIVE), never a failed job. */
  def parse(c: Column, ddl: String): Column =
    from_json(c, DataType.fromDDL(ddl).asInstanceOf[StructType])

  /** One-field convenience: parse and project a single typed field. */
  def extract(c: Column, field: String, ddl: String): Column =
    parse(c, ddl).getField(field)
}
