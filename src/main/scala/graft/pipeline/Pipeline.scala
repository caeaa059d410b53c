package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.operators.{Anonymize, Profile, Reports}
import graft.sources.Lake

/** Stage audit entry (reference: src/transform_log.py:36-114 V6 — the
  * before/after row/dup deltas the reference logs around each stage). */
final case class StageAudit(stage: String, table: String,
                            rowsBefore: Long, rowsAfter: Long, dupsRemoved: Long) {
  def toJson: String =
    s"""{"stage":"$stage","table":"$table","rows_before":$rowsBefore,""" +
      s""""rows_after":$rowsAfter,"dups_removed":$dupsRemoved}"""
}

/** The reference's flagship batch lifecycle (SURVEY.md §3.1/§3.2):
  * ingest → cleanse → anonymize → transform → publish, re-expressed
  * as a library of composable stages over a three-zone [[Lake]].
  *
  * Differences from the reference, by design:
  *  - raw-zone writes are genuinely partitioned by ingest date (the
  *    reference silently dropped partitionBy, SURVEY.md S6);
  *  - anonymization builds a distributed vault table instead of
  *    collecting 100k distinct values to the driver (§2.8);
  *  - de-anonymized "readable" reports come from a join, not a
  *    driver-side dict substitution;
  *  - profiling is one aggregate pass per table, not 3 jobs/column.
  */
final class Pipeline(spark: SparkSession, lake: Lake,
                     piiPatterns: Seq[String] = Seq("fullname", "name")) {

  private val auditLog = scala.collection.mutable.ArrayBuffer.empty[StageAudit]
  def audits: Seq[StageAudit] = auditLog.toSeq

  /** Ingest every CSV under `csvDir` into the raw zone, stamped with
    * the ingest date and partitioned by it (reference:
    * src/runnerfile.py:452-481 S1 + ingest_data.py:92-96 P4).
    * Tables present in `schemas` use their declared StructType (no
    * inference pass, stable types — see [[Schemas]]); others fall
    * back to inference for reference parity. */
  def ingestCsvDir(csvDir: String, year: Int, month: Int, day: Int,
                   schemas: Map[String, org.apache.spark.sql.types.StructType] = Map.empty)
      : Seq[String] = {
    val listed = Option(new java.io.File(csvDir).listFiles((_, n) => n.endsWith(".csv")))
    require(listed.isDefined, s"not a readable directory: $csvDir")
    val csvs = listed.get.toSeq.sortBy(_.getName)
    csvs.map { f =>
      val table = f.getName.stripSuffix(".csv")
      val df = Lake.stampIngestDate(
        Lake.ingestCsv(spark, f.getPath, schemas.get(table)), year, month, day)
      lake.writeRaw(df, table, Seq("year", "month", "day"))
      val n = df.count()
      auditLog += StageAudit("ingest", table, n, n, 0)
      table
    }
  }

  /** Incremental JDBC ingest — the reference's PRODUCTION path
    * (reference: src/helpers/ingest_data.py:25-128 S3+S4: RDBMS fact,
    * max-id watermark over the landed data, pull only the new slice),
    * at scale: the watermark comes from the already-landed raw table
    * (first run → full load), the slice reads over `numPartitions`
    * striped connections with the watermark as BOTH pushed filter and
    * stride lower bound ([[Lake.jdbcIncrementalRead]]), and the new
    * rows land APPENDED under the ingest-date partition — earlier
    * loads are never rewritten, so a daily incremental run touches
    * only its own partition. Returns the number of rows landed. */
  def ingestJdbcIncremental(table: String, opts: Map[String, String],
                            idCol: String, year: Int, month: Int, day: Int,
                            numPartitions: Int = 8): Long = {
    // 'no prior data' must mean the path is absent, not 'the read
    // failed somehow' — a swallowed corrupt-file/permission error here
    // would reset the watermark and APPEND a full re-pull next to the
    // existing partitions (duplicate rows nothing later dedups)
    val existing =
      if (Lake.pathExists(spark, s"${lake.raw}/$table"))
        Some(lake.readRaw(spark, table))
      else None
    val watermark = existing.flatMap(df => Lake.maxWatermark(df, idCol))
    // pin the slice so count and write come from ONE remote scan:
    // unpinned, count() runs a full JDBC pull and the lazy write
    // re-runs it — 2x the remote IO, and rows inserted between the two
    // scans make the audited count diverge from the rows landed
    val slice = Lake.stampIngestDate(
      Lake.jdbcIncrementalRead(spark, opts, idCol, watermark, numPartitions),
      year, month, day)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = slice.count()
      if (n > 0)
        slice.write.mode(org.apache.spark.sql.SaveMode.Append)
          .partitionBy("year", "month", "day").parquet(s"${lake.raw}/$table")
      auditLog += StageAudit("ingest", table, n, n, 0)
      n
    } finally slice.unpersist(): Unit
  }

  /** Cleanse a raw table: full-row dedup + optional integer casts
    * (reference: src/helpers/preprocessing_data.py:76-130 D1/P5). */
  def cleanse(table: String, intCastCols: Seq[String] = Nil): DataFrame = {
    val raw = lake.readRaw(spark, table)
    val before = raw.count()
    val casted = intCastCols.foldLeft(raw)((d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast(IntegerType)) else d)
    val deduped = casted.dropDuplicates()
    val after = deduped.count()
    lake.writeCleansed(deduped, table)
    auditLog += StageAudit("cleanse", table, before, after, before - after)
    deduped
  }

  /** Anonymize PII columns of a cleansed table, writing the
    * original→hash vault next to it (reference: §2.8). */
  def anonymize(table: String): Seq[String] = {
    // restart safety: if a prior run crashed mid-overwriteSelf the
    // live path is missing (data parked at .__old) — heal BEFORE the
    // read below, which would otherwise throw Path-does-not-exist
    Lake.healCrashedOverwrite(spark, s"${lake.cleansed}/$table")
    val df = lake.readCleansed(spark, table)
    val pii = SchemaResolver.piiCols(df, piiPatterns)
    pii.foreach { c =>
      lake.writeCurated(Anonymize.vault(df, c), s"__vault_${table}_$c")
    }
    if (pii.nonEmpty) // reads + rewrites the same path: stage-and-swap
      Lake.overwriteSelf(Anonymize.anonymize(df, pii), s"${lake.cleansed}/$table")
    pii
  }

  /** drug_report via the reference's column heuristics (reference:
    * src/runnerfile.py:315-389 A3): group the fact by the discovered
    * drug column, sum the heuristically-discovered measure — which is
    * the *cost* column on the reference schema (last-match-wins). */
  def drugReport(factTable: String): DataFrame = {
    val fact = lake.readCleansed(spark, factTable)
    val drug = SchemaResolver.drugCol(fact)
      .getOrElse(sys.error(s"no drug column in $factTable"))
    val measure = SchemaResolver.measureCol(fact)
      .getOrElse(sys.error(s"no measure column in $factTable"))
    val report = fact.groupBy(col(drug))
      // decimal sum: exact and summation-order independent, like every
      // other money measure in the repo (a double sum is neither)
      .agg(Reports.dsum(col(measure)).as("prescriptions"))
      .orderBy(col("prescriptions").desc, col(drug))
    lake.writeCurated(report, "drug_report")
    auditLog += StageAudit("transform", "drug_report", fact.count(), report.count(), 0)
    report
  }

  /** prescriber_report: count(*) per prescriber joined to names
    * (reference: src/runnerfile.py:402-434 A4+J2). */
  def prescriberReport(factTable: String, dimTable: String, key: String,
                       nameCol: String): DataFrame = {
    val fact = lake.readCleansed(spark, factTable)
    val dim = lake.readCleansed(spark, dimTable).select(col(key), col(nameCol))
    val report = fact.groupBy(col(key))
      .agg(count(lit(1)).as("num_prescriptions"))
      .join(dim, Seq(key), "left")
      .orderBy(col("num_prescriptions").desc, col(key))
    lake.writeCurated(report, "prescriber_report")
    auditLog += StageAudit("transform", "prescriber_report", fact.count(), report.count(), 0)
    report
  }

  /** De-anonymized "readable" flavor of a curated report (reference:
    * src/runnerfile.py:523-556 S8) — a vault join, not a driver dict. */
  def readableReport(report: String, hashedCol: String, vaultTable: String): DataFrame = {
    val df = lake.readCurated(spark, report)
    val vault = lake.readCurated(spark, vaultTable)
    Anonymize.deanonymize(df, vault, hashedCol)
  }

  /** Write the readable report as a single header CSV under the
    * curated zone (reference: src/runnerfile.py:550-551 S8). */
  def writeReadableCsv(report: String, hashedCol: String, vaultTable: String): String = {
    val path = s"${lake.curated}/readable_$report"
    Lake.writeCsv(readableReport(report, hashedCol, vaultTable), path)
    path
  }

  /** Export curated reports into a relational database — the
    * reference's "readable SQLite export" workflow step (reference:
    * src/export_sqlite.py:13-42 S9). Engine-side the export is
    * dialect-agnostic JDBC; PipelineSpec drives it end-to-end against
    * the embedded Derby that ships with Spark. Embedded dialects
    * (derby/sqlite) ignore host/port; server dialects
    * (postgresql/mysql) need them. Reports are post-aggregation
    * small, so one partition per table keeps the DB write a single
    * transaction stream. */
  def exportReports(dialect: String, database: String, reports: Seq[String],
                    user: String = "app", password: String = "app",
                    host: String = "", port: Int = 0): Unit = {
    val (url, driver) = Lake.jdbcUrl(dialect, host, port, database)
    reports.foreach { r =>
      val df = lake.readCurated(spark, r)
      Lake.jdbcWrite(df, Lake.jdbcOptions(url, r, user, password, driver), numPartitions = 1)
      val n = df.count()
      auditLog += StageAudit("export", r, n, n, 0)
    }
  }

  /** Per-table profiling artifacts (reference: §2.9 V1/V2), one
    * aggregate pass each. */
  def profile(table: String): DataFrame =
    Profile.dataDictionary(lake.readCleansed(spark, table))

  /** Write the audit log as JSON (reference: transform_log.py V6). */
  def writeAuditLog(path: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path),
      auditLog.map(_.toJson).mkString("[", ",", "]"))
  }
}
