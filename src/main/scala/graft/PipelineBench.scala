package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Pipeline, Schemas}
import graft.sources.{Lake, Tables}

/** End-to-end pipeline benchmark — the ONE number directly comparable
  * to the reference's only published bound (its CI runs the full
  * ingest->cleanse->anonymize->report pipeline on a ~6,000-row fact in
  * under 10 minutes; reference: .github/workflows/dashboard.yml:32).
  * This main runs the SAME reference-shaped pipeline
  * (pipeline/Pipeline.scala: CSV ingest with declared schemas, date
  * partitioning, full-row dedup + casts, PII hash + vault, the A3/A4
  * reports, vault-join readable report + CSV artifact, RDBMS export,
  * profile, audit log) over a fact derived from the sf0.1 testdata —
  * 600 k rows, 100x the reference's data.
  *
  * Untimed setup renders the TPC-H-ish tables into the reference's CSV
  * shapes (Schemas.prescriber/drug/prescriberDrug): supplier ->
  * prescriber (s_name is the PII column), part brands -> drug dim,
  * lineitem x part -> prescriber_drug fact. Timing starts at the first
  * pipeline stage, exactly where the reference's CI clock effectively
  * starts (its fixture CSVs are checked in).
  *
  * Prints one JSON line:
  * {"metric":"pipeline_e2e","unit":"sec","sf":...,"stages":{...},"value":N}
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // graft buckets tables DELIBERATELY (pruned index probes, co-located
      // joins); the auto rule would silently drop SelectedBucketsCount
      // pruning on probe-only plans (filter on the bucket key, no join/agg)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-pipebench").toString
    val csvDir = s"$root/csv"

    // ---- untimed setup: render sf tables into the reference's shapes
    val supplier = Tables.load(spark, sfDir, "supplier")
    val part = Tables.load(spark, sfDir, "part")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    supplier.select(
        col("s_suppkey").cast("int").as("presc_id"),
        col("s_name").as("presc_fullname"),
        lit("GENERAL").as("presc_specialty"),
        col("s_nationkey").cast("string").as("presc_state_code"))
      .coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(s"$root/stage/prescriber")
    part.groupBy(col("p_brand").as("drug_brand_name"))
      .agg(min(col("p_partkey")).cast("int").as("drug_id"),
        first(col("p_name")).as("drug"), first(col("p_type")).as("drug_type"))
      .select("drug_id", "drug_brand_name", "drug", "drug_type")
      .coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(s"$root/stage/drug")
    // the fact: one row per lineitem, brand from the part dim — the
    // reference's 25M-row prod fact shape at the 600k test scale
    lineitem.join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_suppkey").cast("int").as("presc_id"),
        col("p_brand").as("drug_brand_name"),
        col("l_quantity").cast("int").as("total_claims"),
        col("l_extendedprice").cast("double").as("total_drug_cost"))
      .coalesce(4).write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(s"$root/stage/prescriber_drug")
    // the pipeline ingests a flat dir of <table>.csv files
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(csvDir))
    for (t <- Seq("prescriber", "drug", "prescriber_drug")) {
      val dir = new java.io.File(s"$root/stage/$t")
      val parts = dir.listFiles((_, n) => n.startsWith("part-") && n.endsWith(".csv"))
        .sortBy(_.getName)
      val out = new java.io.FileOutputStream(s"$csvDir/$t.csv")
      try {
        var first = true
        parts.foreach { p =>
          val lines = java.nio.file.Files.readAllLines(p.toPath)
          val body = if (first) lines else lines.subList(1, lines.size)
          first = false
          body.forEach { l => out.write((l + "\n").getBytes("UTF-8")) }
        }
      } finally out.close()
    }

    val nFact = spark.read.option("header", "true").csv(s"$csvDir/prescriber_drug.csv").count()

    // ---- timed: the reference pipeline, stage by stage
    val lake = Lake(s"$root/raw", s"$root/cleansed", s"$root/curated")
    val pipe = new Pipeline(spark, lake, piiPatterns = Seq("fullname"))
    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      stages(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    timed("ingest")(pipe.ingestCsvDir(csvDir, 2026, 8, 14, schemas = Schemas.all))
    timed("cleanse") {
      pipe.cleanse("drug")
      pipe.cleanse("prescriber")
      pipe.cleanse("prescriber_drug", intCastCols = Seq("total_claims"))
    }
    timed("anonymize")(pipe.anonymize("prescriber"))
    timed("reports") {
      pipe.drugReport("prescriber_drug")
      pipe.prescriberReport("prescriber_drug", "prescriber",
        "presc_id", "presc_fullname")
    }
    timed("readable")(pipe.writeReadableCsv("prescriber_report",
      "presc_fullname", "__vault_prescriber_presc_fullname"))
    timed("export") {
      System.setProperty("derby.system.home", root)
      pipe.exportReports("derby", s"$root/reportdb",
        Seq("drug_report", "prescriber_report"))
    }
    timed("profile")(pipe.profile("prescriber_drug").count())
    timed("audit")(pipe.writeAuditLog(s"$root/artifacts/audit.json"))

    val total = stages.values.sum
    def ms(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val stageJson = stages.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"pipeline_e2e","unit":"sec","sf":"$sfDir","fact_rows":$nFact,"stages":$stageJson,"value":${ms(total)}}""")
  }
}
