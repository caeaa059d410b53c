package graft.pipeline

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.Lake

/** End-to-end medallion parity test on FIXTURES.md §A healthcare
  * fixtures: ingest CSVs → raw (date-partitioned) → cleansed (dedup +
  * cast) → curated (both reports, incl. the A3 prescriptions-is-cost
  * quirk) → readable (de-anonymized via vault). */
class PipelineSpec extends SparkSuite {

  private def writeFixtures(dir: String): Unit = {
    def w(name: String, content: String): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$dir/$name"), content)
    w("drug.csv",
      """drug_id,drug_brand_name,drug,drug_type
        |10,DrugA,IngredientA,antibiotic
        |11,DrugB,IngredientB,ALERGIC
        |""".stripMargin)
    w("prescriber.csv",
      """presc_id,presc_fullname,presc_specialty,presc_state_code
        |1,Alice Adams,Cardiology,CA
        |1,Alice Adams,Cardiology,CA
        |2,Bob Brown,Oncology,NY
        |""".stripMargin) // duplicate full row: dedup test
    w("prescriber_drug.csv",
      """presc_id,drug_brand_name,total_claims,total_drug_cost
        |1,DrugA,10,100.5
        |1,DrugA,10,100.5
        |1,DrugB,5,50.25
        |2,DrugA,2,20.0
        |2,DrugZ,1,7.75
        |""".stripMargin) // dup row + a brand absent from drug.csv
  }

  test("full pipeline: ingest -> cleanse -> anonymize -> reports -> readable") {
    val root = Files.createTempDirectory("graft-e2e").toString
    val csvDir = s"$root/csv"; Files.createDirectories(java.nio.file.Paths.get(csvDir))
    writeFixtures(csvDir)
    val lake = Lake(s"$root/raw", s"$root/cleansed", s"$root/curated")
    val pipe = new Pipeline(spark, lake, piiPatterns = Seq("fullname"))

    // ingest: all three tables land date-partitioned in raw, with
    // declared schemas where available (no inference drift)
    val tables = pipe.ingestCsvDir(csvDir, 2026, 8, 12, schemas = Schemas.all)
    assert(tables === Seq("drug", "prescriber", "prescriber_drug"))
    assert(lake.readRaw(spark, "prescriber_drug").schema("total_claims").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(new java.io.File(s"$root/raw/prescriber/year=2026/month=8/day=12").exists())

    // cleanse: full-row dedup (prescriber 3->2, fact 5->4) + cast
    assert(pipe.cleanse("drug").count() === 2)
    assert(pipe.cleanse("prescriber").count() === 2)
    val fact = pipe.cleanse("prescriber_drug", intCastCols = Seq("total_claims"))
    assert(fact.count() === 4)
    assert(fact.schema("total_claims").dataType ===
      org.apache.spark.sql.types.IntegerType)

    // anonymize: presc_fullname hashed, vault written
    assert(pipe.anonymize("prescriber") === Seq("presc_fullname"))
    val anon = lake.readCleansed(spark, "prescriber")
    assert(anon.select("presc_fullname").collect().forall(_.getString(0).length == 64))

    // drug_report: heuristic measure = total_drug_cost (last-match-wins)
    // so "prescriptions" is a COST sum — the reference's A3 quirk.
    val dr = pipe.drugReport("prescriber_drug").collect()
    val m = dr.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("DrugA") === 120.5)
    assert(m("DrugB") === 50.25)
    assert(m("DrugZ") === 7.75) // brand absent from dim still reported

    // prescriber_report: count(*) per prescriber + hashed name joined
    val pr = pipe.prescriberReport("prescriber_drug", "prescriber",
      "presc_id", "presc_fullname").collect()
    assert(pr.map(r => r.getInt(0) -> r.getLong(1)).toMap === Map(1 -> 2L, 2 -> 2L))

    // readable report: vault join restores the original names
    val readable = pipe.readableReport("prescriber_report", "presc_fullname",
      "__vault_prescriber_presc_fullname")
    val names = readable.collect().map(_.getAs[String]("presc_fullname")).toSet
    assert(names === Set("Alice Adams", "Bob Brown"))

    // readable CSV artifact round-trips with the original names
    val csvPath = pipe.writeReadableCsv("prescriber_report", "presc_fullname",
      "__vault_prescriber_presc_fullname")
    val csvBack = graft.sources.Lake.ingestCsv(spark, csvPath)
    assert(csvBack.collect().map(_.getAs[String]("presc_fullname")).toSet ===
      Set("Alice Adams", "Bob Brown"))

    // S9-shaped export: curated reports land in a real RDBMS (embedded
    // Derby here; sqlite/postgres in production is a driver-jar swap)
    System.setProperty("derby.system.home", root)
    pipe.exportReports("derby", s"$root/reportdb",
      Seq("drug_report", "prescriber_report"))
    val (xurl, xdriver) = Lake.jdbcUrl("derby", "", 0, s"$root/reportdb")
    val exported = Lake.jdbcRead(spark,
      Lake.jdbcOptions(xurl, "drug_report", "app", "app", xdriver))
    assert(exported.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      .apply("DrugA") === 120.5)

    // profiling + audit artifacts
    assert(pipe.profile("prescriber_drug").count() === 7) // 4 cols + y/m/d
    pipe.writeAuditLog(s"$root/artifacts/audit.json")
    val audit = Files.readString(java.nio.file.Paths.get(s"$root/artifacts/audit.json"))
    assert(audit.contains(""""stage":"cleanse","table":"prescriber","rows_before":3,"rows_after":2,"dups_removed":1"""))
  }

  test("incremental JDBC ingest: full first load, watermark slice second, partitions append") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-jdbc-ingest").toString
    System.setProperty("derby.system.home", root)
    val (url, driver) = Lake.jdbcUrl("derby", "", 0, s"$root/sourcedb")
    val opts = Lake.jdbcOptions(url, "fact", "app", "app", driver)
    val lake = Lake(s"$root/raw", s"$root/cleansed", s"$root/curated")
    val pipe = new Pipeline(spark, lake)
    // day 1: source has 100 rows -> full load (no watermark yet)
    Lake.jdbcWrite((1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload"), opts)
    assert(pipe.ingestJdbcIncremental("fact", opts, "id", 2026, 8, 14,
      numPartitions = 3) === 100L)
    // day 2: source grows to 120 -> only the 20 new rows land
    Lake.jdbcWrite((1L to 120L).map(i => (i, s"v$i")).toDF("id", "payload"), opts)
    assert(pipe.ingestJdbcIncremental("fact", opts, "id", 2026, 8, 15,
      numPartitions = 3) === 20L)
    // day 3: nothing new -> zero rows, no write
    assert(pipe.ingestJdbcIncremental("fact", opts, "id", 2026, 8, 16) === 0L)
    val raw = lake.readRaw(spark, "fact")
    assert(raw.count() === 120L)
    assert(raw.select("id").distinct().count() === 120L) // no stale re-pull
    // earlier loads untouched: each slice sits in its own date partition
    assert(raw.groupBy("day").count().orderBy("day").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toSeq === Seq(14 -> 100L, 15 -> 20L))
    assert(new java.io.File(s"$root/raw/fact/year=2026/month=8/day=15").exists())
  }

  test("SchemaResolver heuristics mirror the reference's conventions") {
    import spark.implicits._
    val fact = Seq((1, "x", 2, 3.0)).toDF("presc_id", "drug_brand_name",
      "total_claims", "total_drug_cost")
    assert(SchemaResolver.drugCol(fact) === Some("drug_brand_name"))
    // last-match-wins: cost beats claims — the A3 quirk's root cause
    assert(SchemaResolver.measureCol(fact) === Some("total_drug_cost"))
    assert(SchemaResolver.idCol("prescriber", fact) === Some("presc_id"))
    assert(SchemaResolver.piiCols(fact, Seq("name")) === Seq("drug_brand_name"))
  }
}
