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

  /** t-closeness audit ([EXT]) — completes the privacy triad with
    * [[kAnonymity]] and [[lDiversity]]: per quasi-identifier group,
    * the total-variation distance between the group's sensitive-value
    * distribution and the table-wide one, `TV = ½·Σ_s |p_s − q_s|`
    * (the categorical Earth-Mover's distance with unit ground
    * metric). k-anonymity bounds group SIZE and l-diversity counts
    * distinct values, but a group can pass both while being 95% one
    * diagnosis — the distribution skew t-closeness flags.
    *
    * Shape: no (group × sensitive) spine — absent values' mass folds
    * in algebraically: Σ_absent q_s = 1 − Σ_present q_s, so
    * `TV = ½·(Σ_present |p_s − q_s| + 1 − Σ_present q_s)` needs only
    * the observed (group, sensitive) aggregate, group totals as a
    * window ON those rows, and the broadcast global distribution.
    * Determinism: both per-value terms are rounded to 6dp then
    * DECIMAL-summed (the dsum convention); the final expression is
    * one IEEE chain rounded to 6dp. */
  def tCloseness(df: DataFrame, qi: Seq[String], sensitive: String): DataFrame = {
    require(qi.nonEmpty, "tCloseness needs at least one quasi-identifier column")
    import org.apache.spark.sql.types.DecimalType
    val global = df.groupBy(col(sensitive).as("__s"))
      .agg(count(lit(1)).as("__ns"))
    val total = df.agg(count(lit(1)).as("__n"))
    val gdist = global.crossJoin(broadcast(total))
      .select(col("__s"),
        (col("__ns").cast("double") / col("__n").cast("double")).as("__q"))
    val cells = df.groupBy(qi.map(col) :+ col(sensitive).as("__s"): _*)
      .agg(count(lit(1)).as("__ngs"))
      .withColumn("__ng", sum(col("__ngs")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(qi.map(col): _*)))
    val p = col("__ngs").cast("double") / col("__ng").cast("double")
    // NULL-SAFE join on the sensitive value: a NULL sensitive class
    // is counted in both totals, so an equi-join would DROP its cell
    // and its global row, mis-attributing its mass to the absent-
    // values fold-in (a group mirroring a half-NULL global would
    // score 0.25 instead of the true 0)
    cells.join(gdist.withColumnRenamed("__s", "__gs"),
        col("__s") <=> col("__gs"))
      .select(qi.map(col) :+ col("__ng") :+
        round(abs(p - col("__q")), 6).cast(DecimalType(18, 6)).as("__d") :+
        round(col("__q"), 6).cast(DecimalType(18, 6)).as("__qp"): _*)
      .groupBy(qi.map(col): _*)
      .agg(max(col("__ng")).as("n_rows"),
        sum(col("__d")).as("__sd"), sum(col("__qp")).as("__sq"))
      .select(qi.map(col) :+ col("n_rows") :+
        round(lit(0.5) * (col("__sd").cast("double") +
          (lit(1.0) - col("__sq").cast("double"))), 6).as("t_closeness"): _*)
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
