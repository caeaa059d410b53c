package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.sources.Lake

/** Runnable end-to-end example of the medallion pipeline on tiny
  * healthcare-shaped CSVs (FIXTURES.md §A). Usage:
  * `sbt "runMain graft.pipeline.PipelineDemo [workDir]"` — prints the
  * curated reports and the audit log. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(Files.createTempDirectory("graft-demo").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val csvDir = s"$root/csv"
    Files.createDirectories(java.nio.file.Paths.get(csvDir))
    Files.writeString(java.nio.file.Paths.get(s"$csvDir/drug.csv"),
      "drug_id,drug_brand_name,drug,drug_type\n10,DrugA,IngA,antibiotic\n11,DrugB,IngB,ALERGIC\n")
    Files.writeString(java.nio.file.Paths.get(s"$csvDir/prescriber.csv"),
      "presc_id,presc_fullname,presc_specialty,presc_state_code\n" +
        "1,Alice Adams,Cardiology,CA\n1,Alice Adams,Cardiology,CA\n2,Bob Brown,Oncology,NY\n")
    Files.writeString(java.nio.file.Paths.get(s"$csvDir/prescriber_drug.csv"),
      "presc_id,drug_brand_name,total_claims,total_drug_cost\n" +
        "1,DrugA,10,100.5\n1,DrugB,5,50.25\n2,DrugA,2,20.0\n")

    val lake = Lake(s"$root/raw", s"$root/cleansed", s"$root/curated")
    val pipe = new Pipeline(spark, lake, piiPatterns = Seq("fullname"))
    pipe.ingestCsvDir(csvDir, 2026, 8, 12)
    Seq("drug", "prescriber").foreach(t => pipe.cleanse(t))
    pipe.cleanse("prescriber_drug", intCastCols = Seq("total_claims"))
    pipe.anonymize("prescriber")
    println("== drug_report (prescriptions = heuristic measure = cost; reference A3 quirk) ==")
    pipe.drugReport("prescriber_drug").show(truncate = false)
    println("== prescriber_report (names hashed) ==")
    pipe.prescriberReport("prescriber_drug", "prescriber", "presc_id", "presc_fullname")
      .show(truncate = false)
    println("== readable prescriber_report (vault-joined) ==")
    pipe.readableReport("prescriber_report", "presc_fullname",
      "__vault_prescriber_presc_fullname").show(truncate = false)
    pipe.writeAuditLog(s"$root/artifacts/audit.json")
    println("audit: " + Files.readString(java.nio.file.Paths.get(s"$root/artifacts/audit.json")))
    spark.stop()
  }
}
