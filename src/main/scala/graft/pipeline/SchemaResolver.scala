package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Heuristic column discovery (reference: SURVEY.md §1.4) — the
  * reference never declares schemas; it *finds* columns by name
  * convention at run time. Kept as a small pure-Scala utility over
  * `df.schema` (no Catalyst involvement needed).
  */
object SchemaResolver {

  /** Measure column: LAST name matching the keyword list wins
    * (reference: src/runnerfile.py:371-381). The last-match-wins rule
    * is a deliberate reference quirk: on the healthcare schema it
    * selects `total_drug_cost` over `total_claims`, which is why the
    * reference's "prescriptions" column is actually a cost sum. */
  val measureKeywords: Seq[String] =
    Seq("count", "qty", "quantity", "num", "total", "claims", "cost")

  def measureCol(df: DataFrame): Option[String] =
    df.columns.filter(c => measureKeywords.exists(c.toLowerCase.contains)).lastOption

  /** Drug/product dimension key: any column containing "drug" and
    * ("id" | "name") (reference: src/runnerfile.py:372-377). */
  def drugCol(df: DataFrame): Option[String] =
    df.columns.find { c =>
      val lc = c.toLowerCase
      lc.contains("drug") && (lc.contains("id") || lc.contains("name"))
    }

  /** Id column candidates, in priority order (reference:
    * src/helpers/ingest_data.py:57-63). */
  def idCol(table: String, df: DataFrame): Option[String] = {
    val lower = df.columns.map(c => c.toLowerCase -> c).toMap
    Seq("id", s"${table}_id", s"${table.take(5)}_id", s"${table.take(6)}_id")
      .flatMap(lower.get).headOption
      .orElse(df.columns.find(_.toLowerCase.endsWith("_id")))
  }

  /** PII columns by substring match against a configured list
    * (reference: src/runnerfile.py:250-258). */
  def piiCols(df: DataFrame, patterns: Seq[String]): Seq[String] =
    df.columns.filter(c => patterns.exists(p => c.toLowerCase.contains(p.toLowerCase))).toSeq
}
