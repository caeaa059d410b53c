package graft.pipeline

import org.apache.spark.sql.types._

/** Declared schemas for the reference's four healthcare tables
  * (SURVEY.md §1.6: "we declare what the reference infers"). CSV
  * inference costs an extra full pass over the input and can drift
  * between loads (an all-digit id column inferring int on one day and
  * long on another); production ingest should pass these explicitly —
  * `Lake.ingestCsv(spark, path, Some(Schemas.prescriberDrug))`.
  *
  * Column lists follow the reference's committed data
  * (reference: docs/data_dictionary.csv:1-16, local_data raw/cleansed
  * parquet footers). */
object Schemas {

  val state: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("state_name", StringType),
    StructField("state_code", StringType)))

  val drug: StructType = StructType(Seq(
    StructField("drug_id", IntegerType),
    StructField("drug_brand_name", StringType),
    StructField("drug", StringType),
    StructField("drug_type", StringType)))

  val prescriber: StructType = StructType(Seq(
    StructField("presc_id", IntegerType),
    StructField("presc_fullname", StringType),
    StructField("presc_specialty", StringType),
    StructField("presc_state_code", StringType)))

  val prescriberDrug: StructType = StructType(Seq(
    StructField("presc_id", IntegerType),
    StructField("drug_brand_name", StringType),
    StructField("total_claims", IntegerType),
    StructField("total_drug_cost", DoubleType)))

  val all: Map[String, StructType] = Map(
    "state" -> state,
    "drug" -> drug,
    "prescriber" -> prescriber,
    "prescriber_drug" -> prescriberDrug)
}
