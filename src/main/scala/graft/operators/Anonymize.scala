package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII anonymization (reference: src/runnerfile.py:248-313 §2.8).
  *
  * The reference collects up to 100k distinct PII values into the
  * driver to build the hash mapping — a scale bug. Here the mapping
  * ("vault") is itself a distributed table, and de-anonymization is a
  * broadcast join on the hash, so nothing PII-sized ever lands on the
  * driver.
  */
object Anonymize {

  /** sha256 hex of a column (reference: src/runnerfile.py:271 P9). */
  def sha256(c: Column): Column = sha2(c.cast("string"), 256)

  /** Replace the named columns with their sha256 hash. */
  def anonymize(df: DataFrame, piiCols: Seq[String]): DataFrame =
    piiCols.foldLeft(df)((d, c) => d.withColumn(c, sha256(col(c))))

  /** k-anonymity risk report ([EXT]): the release-gate complement of
    * hashing — hashing direct identifiers does nothing about
    * QUASI-identifier combinations (nation × segment × ...) that
    * single out individuals by rarity. One row per observed
    * combination with its population and an `at_risk` flag
    * (group smaller than k); publish only after suppressing or
    * generalizing the flagged groups.
    *
    * One map-side-combined aggregate — group count is bounded by the
    * quasi-value cross product, not the table; the shuffle carries one
    * row per combination per task. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k > 0, s"need quasi columns and k>0 (k=$k)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("at_risk", col("group_size") < k)
      .orderBy(quasiCols.map(col): _*)
  }

  /** Vault table: distinct original -> hash mapping, written as a
    * restricted-access table instead of a driver-built dict
    * (reference: src/runnerfile.py:261-268 A8). */
  def vault(df: DataFrame, c: String): DataFrame =
    df.select(col(c).as("original"))
      .where(col("original").isNotNull)
      .distinct()
      .withColumn("hashed", sha256(col("original")))

  /** Reverse an anonymized column via a join against the vault
    * (replaces the reference's driver-side dict substitution,
    * src/runnerfile.py:526-549). Deliberately NOT an explicit
    * broadcast: the vault is one row per distinct PII value and can be
    * arbitrarily large, so we leave the strategy to Catalyst/AQE —
    * it broadcasts when the vault is actually small and falls back to
    * a shuffle join when it isn't, instead of OOMing the driver. */
  def deanonymize(df: DataFrame, vaultDf: DataFrame, hashedCol: String): DataFrame =
    df.join(vaultDf, df(hashedCol) === vaultDf("hashed"), "left")
      .drop(hashedCol, "hashed")
      .withColumnRenamed("original", hashedCol)

  /** l-diversity audit ([EXT]) — for each quasi-identifier group, the
    * number of DISTINCT sensitive values it contains: k-anonymity's
    * necessary complement (a group of 500 identical diagnoses is
    * k-anonymous and still leaks the diagnosis; l >= 2 is the minimum
    * for the sensitive attribute to stay ambiguous). One hash
    * aggregate; the distinct count is exact (Spark plans the standard
    * two-phase Expand distinct). */
  def lDiversity(df: DataFrame, qi: Seq[String], sensitive: String): DataFrame = {
    require(qi.nonEmpty, "lDiversity needs at least one quasi-identifier column")
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitive)).as("l_diversity"))
      .orderBy(qi.map(col): _*)
  }

  /** AES-GCM file encryption for the vault at rest — driver-side
    * utility mirroring the reference's mapping-file encryption
    * (src/runnerfile.py:279-309), minus its XOR fallback. */
  def encryptBytes(plain: Array[Byte], key: Array[Byte]): Array[Byte] = {
    require(key.length == 16 || key.length == 24 || key.length == 32, "AES key must be 16/24/32 bytes")
    val iv = new Array[Byte](12)
    new java.security.SecureRandom().nextBytes(iv)
    val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, iv))
    iv ++ cipher.doFinal(plain)
  }

  def decryptBytes(enc: Array[Byte], key: Array[Byte]): Array[Byte] = {
    val (iv, body) = enc.splitAt(12)
    val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, iv))
    cipher.doFinal(body)
  }
}
