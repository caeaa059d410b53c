package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Three-zone medallion lake (raw -> cleansed -> curated), the
  * reference's data model (reference: utils/project.cfg:1-4,
  * src/runnerfile.py:35-39).
  *
  * Design notes for scale:
  *  - writes are real `partitionBy` — the reference *intended*
  *    year/month/day partitioning but silently dropped it
  *    (reference: src/common/s3.py:218, SURVEY.md S6); we implement
  *    the intent so downstream date filters get partition pruning.
  *  - readers are plain `spark.read.parquet` so filter/column
  *    pushdown reaches the scan.
  */
final case class Lake(raw: String, cleansed: String, curated: String) {
  def readRaw(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$raw/$table")
  def readCleansed(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$cleansed/$table")
  def readCurated(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$curated/$table")

  def writeRaw(df: DataFrame, table: String, partitionCols: Seq[String] = Nil): Unit =
    Lake.write(df, s"$raw/$table", partitionCols)
  def writeCleansed(df: DataFrame, table: String, partitionCols: Seq[String] = Nil): Unit =
    Lake.write(df, s"$cleansed/$table", partitionCols)
  def writeCurated(df: DataFrame, table: String, partitionCols: Seq[String] = Nil): Unit =
    Lake.write(df, s"$curated/$table", partitionCols)
}

object Lake {

  /** Hadoop-FS existence probe — the "is this a first load?" test
    * callers need BEFORE a read, so genuine read failures (corrupt
    * footer, transient FS/permission error) can propagate instead of
    * being swallowed as 'no prior data' (which would reset watermarks
    * and re-append a full pull next to the existing rows). */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Build-once cache with a SOURCE-FINGERPRINT stamp (local-FS
    * caches: derived signature/set/index tables the registry's
    * persisted rows reuse across invocations). A bare `_SUCCESS` check
    * has a stale-cache trap: if the source table is regenerated IN
    * PLACE, the old cache keeps serving rows from the dead corpus and
    * downstream results go wrong silently. This helper stamps the
    * caller's cheap source fingerprint (row count, or min/max id)
    * beside `_SUCCESS` and re-runs `build` whenever `_SUCCESS` or the
    * stamp is missing or the fingerprint changed. `build` must leave
    * `_SUCCESS` under `dir` (every Spark parquet write does). */
  /** Cheap CONTENT-SENSITIVE source fingerprint for [[buildOnce]]: row
    * count plus the exact sum of per-row xxhash64 over every column
    * (order-independent; DECIMAL(38,0) so the sum never overflows at
    * any corpus size, and never trips ANSI arithmetic). A count-only
    * stamp misses the common in-place regeneration that KEEPS the row
    * count — same scale factor, new generator seed, ids 0..n-1 either
    * way — which is exactly the trap buildOnce exists to close. One
    * full scan of the source per invocation; the caches this guards
    * cost a training run or a signature build to rebuild, so the scan
    * is the cheap side of the trade. */
  def fingerprint(df: DataFrame): String = {
    val r = df.agg(count(lit(1)),
      sum(xxhash64(struct(df.columns.map(col).toSeq: _*))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
    val h = if (r.isNullAt(1)) "0" else r.getDecimal(1).toBigInteger.toString
    s"${r.getLong(0)}:$h"
  }

  /** [[fingerprint]] memoized per (session, caller key): the scan is
    * paid once per source per session instead of on every invocation
    * of every persisted registry row (at bench time the same
    * embeddings table was being re-fingerprinted per query). The key
    * must name the SOURCE (e.g. its path) — two different tables must
    * never share a key. Within one session an in-place regeneration of
    * the source goes unseen (the cross-session protection is the trap
    * [[buildOnce]] exists to close; a live session regenerating its own
    * inputs mid-flight is not a supported shape). */
  // keyed WEAKLY on the live session object, not identityHashCode:
  // identity hashes are reused after a session is GC'd, and a collision
  // would serve a stale fingerprint for a NEW session over regenerated
  // data — silently reviving the stale-cache trap buildOnce exists to
  // close. A weak key's memo dies with its session by construction.
  private val fpCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())
  def fingerprintCached(df: DataFrame, key: String): String =
    fpCache
      .computeIfAbsent(df.sparkSession,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(key, _ => fingerprint(df))

  def buildOnce(dir: String, fingerprint: String)(build: => Unit): Unit = {
    val stampPath = new java.io.File(dir, "_GRAFT_SOURCE_STAMP").toPath
    val fresh = new java.io.File(dir, "_SUCCESS").exists() &&
      java.nio.file.Files.exists(stampPath) &&
      java.nio.file.Files.readString(stampPath) == fingerprint
    if (!fresh) {
      build
      java.nio.file.Files.writeString(stampPath, fingerprint)
      ()
    }
  }

  /** Recursive LOCAL-filesystem delete (java.nio) for probe/registry
    * temp dirs — not for lake paths (those go through the Hadoop FS).
    * Closes the walk stream (a leaked stream holds a directory fd) and
    * tolerates a missing dir. One spelling shared by ProbeOp and the
    * registry's temp-dir sweep so fd/symlink fixes land once. */
  def deleteRecursivelyLocal(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p))
      scala.util.Using.resource(java.nio.file.Files.walk(p))(
        _.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete))
  }

  /** Snappy-parquet overwrite write, optionally hive-partitioned
    * (reference: src/common/s3.py:195-227). */
  def write(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Overwrite a table path with a plan that READS from that same
    * path. A plain overwrite deletes the input files before the lazy
    * plan scans them (FAILED_READ_FILE); staging to a sibling dir and
    * swapping avoids that without materializing on the driver.
    *
    * The swap goes through the Hadoop `FileSystem` resolved from the
    * path — java.io.File would silently no-op on the HDFS/S3 URIs a
    * real deployment uses — and is ordered so the live table is never
    * the only copy while an operation can still fail: stage the new
    * data, move the live dir ASIDE, promote staging, only then delete
    * the old copy (restoring it if the promote rename fails).
    *
    * Self-healing restart: a crash between "move aside" and "promote"
    * leaves the live path missing with the previous data parked at
    * `.__old`. On entry, that state is detected and the parked copy is
    * renamed back BEFORE any new work (so the plan about to read
    * `path` sees the pre-crash table), and `.__old` is only ever
    * deleted after confirming the live path exists — no manual restore
    * is ever required. */
  def overwriteSelf(df: DataFrame, path: String): Unit = {
    healCrashedOverwrite(df.sparkSession, path)
    val hadoopConf = df.sparkSession.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(hadoopConf)
    val staging = new org.apache.hadoop.fs.Path(path + ".__staging")
    val old = new org.apache.hadoop.fs.Path(path + ".__old")
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // leftover .__old from a prior run that crashed AFTER promoting is
    // safe to clear — the live table exists (verified above)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"failed to move $target aside to $old")
    if (!fs.rename(staging, target)) {
      val restored = fs.exists(old) && fs.rename(old, target)
      throw new java.io.IOException(s"failed to promote $staging into $target" +
        (if (restored) " (original restored)" else s" (original left at $old)"))
    }
    if (fs.exists(target)) fs.delete(old, true): Unit
  }

  /** Restore a table parked at `.__old` by an [[overwriteSelf]] run
    * that crashed between "move aside" and "promote" (live path
    * missing, `.__old` present). Returns true when a restore happened.
    * [[overwriteSelf]] calls this on entry; callers that READ the
    * target to build their overwrite plan should call it BEFORE the
    * read — the read itself fails on the crashed state. */
  def healCrashedOverwrite(spark: SparkSession, path: String): Boolean = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(path + ".__old")
    val crashed = !fs.exists(target) && fs.exists(old)
    if (crashed && !fs.rename(old, target))
      throw new java.io.IOException(
        s"failed to restore crashed overwrite: $old exists but could not move back to $target")
    crashed
  }

  /** CSV ingest with header + schema inference (reference:
    * src/runnerfile.py:456-471 S1). At 100 TB, inference costs one
    * extra pass — production callers should pass an explicit schema. */
  def ingestCsv(spark: SparkSession, path: String,
                schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None    => r.option("inferSchema", "true").csv(path)
    }
  }

  /** JSON-lines ingest (newline-delimited records). Like CSV, pass an
    * explicit schema in production — inference is an extra full pass. */
  def ingestJson(spark: SparkSession, path: String,
                 schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema match {
      case Some(s) => spark.read.schema(s).json(path)
      case None    => spark.read.json(path)
    }

  /** ORC read/write — the other columnar format Spark ships natively;
    * same pushdown/pruning properties as parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  /** Stamp ingestion-date partition columns as literals (reference:
    * src/helpers/ingest_data.py:92-96 P4). */
  def stampIngestDate(df: DataFrame, year: Int, month: Int, day: Int): DataFrame =
    df.withColumn("year", lit(year))
      .withColumn("month", lit(month))
      .withColumn("day", lit(day))

  /** Incremental-ingest watermark: max id in the already-landed data
    * (reference: src/helpers/ingest_data.py:38-85 S4/A5). The caller
    * pushes `idCol > watermark` into the source query (for JDBC,
    * Catalyst pushes the filter into the dbtable subquery). */
  def maxWatermark(existing: DataFrame, idCol: String): Option[Long] = {
    val row = existing.agg(max(col(idCol)).cast("long")).head()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  /** Rows strictly above the watermark — the incremental slice. */
  def incrementalSlice(source: DataFrame, idCol: String, watermark: Option[Long]): DataFrame =
    watermark.fold(source)(w => source.where(col(idCol) > lit(w)))

  /** Change-data-capture diff between two keyed snapshots:
    * (keys..., change) with change ∈ added | removed | changed;
    * unchanged rows are dropped. The max-id watermark (S4) only
    * handles APPENDS — this closes updates and deletes, the other
    * half of incremental ingest. One full-outer shuffle join on the
    * keys; non-key equality is the null-safe column compare (exact,
    * engine-portable). On very wide rows, pre-hashing the payload
    * (xxhash64 over native types) halves the shuffle width at the
    * cost of hash-collision soundness — worth it at 100 TB, not
    * needed for the exact contract here. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"snapshot schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val nonKey = oldDf.columns.toSeq.filterNot(keys.contains)
    val o = oldDf.select(keys.map(col) ++ nonKey.map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select(keys.map(col) ++ nonKey.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__in_new", lit(true))
    val changed = nonKey.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .where(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }

  /** MERGE/upsert emulation over plain parquet (no transactional
    * table format in this environment): the merged table is the
    * updates plus every existing row whose key is NOT updated (one
    * left-anti shuffle join on the keys). Pair with [[snapshotDiff]]
    * (detect) and [[overwriteSelf]] (apply in place, crash-safe) for
    * the full incremental-sync loop. At 100 TB, bucket both sides on
    * the key ([[Bucketing]]) and the anti join plans exchange-free;
    * a real deployment would eventually hand this to a table format's
    * MERGE, which this signature mirrors — including its source-
    * uniqueness precondition: `updates` must hold AT MOST ONE row per
    * key (SQL MERGE errors on multiple matching source rows; here
    * duplicates would both survive into the merged table). Collapse
    * them first with [[graft.operators.Dedup.keyedDeterministicAgg]]
    * if the feed can replay. */
  def upsertByKey(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(existing.columns.toSeq == updates.columns.toSeq,
      s"schemas differ: ${existing.columns.toSeq} vs ${updates.columns.toSeq}")
    updates.unionByName(
      existing.join(updates.select(keys.map(col): _*), keys, "left_anti"))
  }

  /** Partition column of the key-bucketed table layout. Named with a
    * leading underscore so it can't collide with user columns; the
    * `=`-bearing partition dirs (`__kb=7/`) stay visible to Spark's
    * listing (only underscore names WITHOUT `=` are filtered). */
  val BucketCol = "__kb"

  /** Deterministic bucket id for a key tuple: `pmod(hash(keys), n)`.
    * Every row of a key lives in exactly one bucket, so any keyed
    * maintenance op only ever needs the buckets its input keys map
    * to. */
  def keyBucket(keys: Seq[String], numBuckets: Int): org.apache.spark.sql.Column =
    pmod(hash(keys.map(col): _*), lit(numBuckets))

  /** Materialize `df` in the key-bucketed layout: hive-partitioned by
    * [[BucketCol]] = [[keyBucket]]. `numBuckets` fixes the layout —
    * every later [[upsertByKeyPartitioned]]/[[mergeIntoKeyBucketed]]
    * call must pass the same value (the bucket function must agree
    * with the directories on disk). Size it so one bucket ≈ a few GB
    * at the target scale: 100 TB / 4096 buckets ≈ 25 GB per rewrite
    * unit. */
  def writeKeyBucketed(df: DataFrame, path: String, keys: Seq[String],
                       numBuckets: Int): Unit =
    df.withColumn(BucketCol, keyBucket(keys, numBuckets))
      .write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(path)

  /** Read a key-bucketed table back at its logical schema (the
    * physical [[BucketCol]] dropped), healing any crashed bucket swap
    * first. Filters on the key still prune: add
    * `where(keyBucket(keys, n) === ...)` manually, or read with
    * [[BucketCol]] via plain `spark.read.parquet` for explicit
    * bucket-pruned scans. */
  def readKeyBucketed(spark: SparkSession, path: String): DataFrame = {
    healKeyBucketed(spark, path)
    spark.read.parquet(path).drop(BucketCol)
  }

  /** Heal a key-bucketed table whose per-bucket swap crashed: any
    * bucket parked in the `.__aside` sibling with NO live partition
    * dir is restored (crash between "move aside" and "promote");
    * parked copies whose live dir exists are leftovers from a crash
    * after the promote and are cleared. One directory listing — no
    * data read. */
  def healKeyBucketed(spark: SparkSession, path: String): Unit = {
    val asideRoot = new org.apache.hadoop.fs.Path(path + ".__aside")
    val fs = asideRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(asideRoot)) return
    fs.listStatus(asideRoot).foreach { s =>
      val live = new org.apache.hadoop.fs.Path(path, s.getPath.getName)
      if (!fs.exists(live)) {
        if (!fs.rename(s.getPath, live))
          throw new java.io.IOException(
            s"failed to restore crashed bucket swap: ${s.getPath} -> $live")
      } else fs.delete(s.getPath, true): Unit
    }
  }

  /** Bounded-rewrite MERGE into a key-bucketed table: apply
    * `merge(existingTouchedRows, incoming)` and rewrite ONLY the
    * bucket partitions the incoming keys map to. The whole-table
    * rewrite of [[upsertByKey]]+[[overwriteSelf]] is O(table) per
    * call — at 100 TB a CDC stream would spend all its time rewriting
    * unchanged data; this is O(touched buckets) ≈
    * O(|incoming| / numBuckets × table), the shape a transactional
    * format's MERGE has.
    *
    * Mechanics: the touched-bucket set comes from one distinct on the
    * incoming keys' bucket ids (≤ numBuckets values — a bounded driver
    * collect); existing rows are read with a [[BucketCol]] filter the
    * scan prunes to those directories; the merged result is staged to
    * a `.__staging` sibling and each touched bucket dir is swapped in
    * with the same move-aside / promote / delete ordering as
    * [[overwriteSelf]] — each bucket individually atomic and
    * crash-healing ([[healKeyBucketed]]), matching Hive
    * dynamic-partition-overwrite semantics (per-partition, not
    * cross-partition, atomicity; a table format's MERGE is the
    * upgrade path). Untouched bucket directories are never listed,
    * read, or written — their files stay byte-identical.
    *
    * `merge` receives the existing touched rows at the LOGICAL schema
    * (no [[BucketCol]]; empty when the table doesn't exist yet) and
    * must return the full replacement row set for those buckets.
    * Returns the touched bucket ids. */
  def mergeIntoKeyBucketed(spark: SparkSession, path: String, incoming: DataFrame,
                           keys: Seq[String], numBuckets: Int)
                          (merge: (DataFrame, DataFrame) => DataFrame): Seq[Int] = {
    require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
    healKeyBucketed(spark, path)
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val touched = incoming.select(keyBucket(keys, numBuckets).as(BucketCol))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return touched
    val tableExists = fs.exists(target)
    val existingTouched =
      if (!tableExists) incoming.limit(0)
      else spark.read.parquet(path)
        .where(col(BucketCol).isin(touched.map(Int.box): _*))
        .drop(BucketCol)
    val merged = merge(existingTouched, incoming)
      .withColumn(BucketCol, keyBucket(keys, numBuckets))
    if (!tableExists) {
      merged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(path)
      return touched
    }
    val stagingRoot = new org.apache.hadoop.fs.Path(path + ".__staging")
    val asideRoot = new org.apache.hadoop.fs.Path(path + ".__aside")
    // the staged write EXECUTES the merge plan (which reads the live
    // bucket dirs) — all reads complete before any swap below
    merged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
      .parquet(stagingRoot.toString)
    fs.mkdirs(asideRoot)
    touched.foreach { k =>
      val part = s"$BucketCol=$k"
      val live = new org.apache.hadoop.fs.Path(target, part)
      val staged = new org.apache.hadoop.fs.Path(stagingRoot, part)
      val aside = new org.apache.hadoop.fs.Path(asideRoot, part)
      if (fs.exists(aside)) fs.delete(aside, true)
      if (fs.exists(live) && !fs.rename(live, aside))
        throw new java.io.IOException(s"failed to move $live aside to $aside")
      if (fs.exists(staged) && !fs.rename(staged, live)) {
        val restored = fs.exists(aside) && fs.rename(aside, live)
        throw new java.io.IOException(s"failed to promote $staged into $live" +
          (if (restored) " (original restored)" else s" (original left at $aside)"))
      }
      fs.delete(aside, true): Unit
    }
    fs.delete(stagingRoot, true)
    fs.delete(asideRoot, true) // empty after the loop — no residue dirs
    touched
  }

  /** [[upsertByKey]] against a key-bucketed table ON DISK, rewriting
    * only the touched buckets. Same contract (`updates` at most one
    * row per key; updates win, untouched keys survive), same merged
    * table via [[readKeyBucketed]] — but the rewrite cost is bounded
    * by the buckets the update keys land in, not the table size. */
  def upsertByKeyPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                             keys: Seq[String], numBuckets: Int): Seq[Int] =
    mergeIntoKeyBucketed(spark, path, updates, keys, numBuckets) {
      (existing, ups) => upsertByKey(existing, ups, keys)
    }

  /** Small-file compaction ([EXT]): rewrite `path` so each output
    * file is near `targetFileBytes`. Small files are the classic lake
    * pathology — every incremental append/streaming micro-batch adds
    * a few, and at 100 TB a million 1 MB files turn scan planning,
    * NameNode/S3 listing, and task scheduling into the bottleneck
    * (one task per file). The output count comes from ACTUAL on-disk
    * bytes (compressed), not row counts, so compacted files land near
    * the target regardless of schema width; the rewrite is a
    * round-robin `repartition` (a `coalesce` would skip the shuffle
    * but inherits input skew and caps at the current file count), and
    * the swap rides [[overwriteSelf]]'s stage-and-rename, so readers
    * never see a half-compacted table. Returns (filesBefore,
    * filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L << 20): (Int, Int) = {
    healCrashedOverwrite(spark, path)
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(target)
    // a hive-partitioned layout must be compacted per LEAF partition:
    // a flat rewrite here would see zero top-level files (totalBytes
    // 0 → one output task) and collapse the directory structure —
    // silently destroying partition pruning
    val partitionDirs = entries.filter(s => s.isDirectory && s.getPath.getName.contains("="))
    require(partitionDirs.isEmpty,
      s"compact: $path is hive-partitioned (e.g. ${partitionDirs.headOption.map(_.getPath.getName).getOrElse("")}); " +
        "compact leaf partition directories individually")
    val files = entries
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    overwriteSelf(spark.read.parquet(path).repartition(nOut), path)
    (files.length, nOut)
  }

  // ---- snapshot versioning / time travel ([EXT]) ----
  // Reproducible-corpus snapshots: every publish lands in an IMMUTABLE
  // `v=N` directory and a `_latest` marker advances atomically, so a
  // training run can pin "corpus v7" and re-read the byte-identical
  // snapshot months later while ingestion keeps publishing — the
  // version identity that the dedup/signature tables ("rebuilt when
  // the corpus version changes") and model cards reference. Readers
  // racing a writer see either the old or the new version, never a
  // mix; published directories are never mutated (object-store
  // friendly: no in-place rewrites, no read-after-overwrite
  // inconsistency). Retention is [[pruneVersions]] — bounded, and
  // never the marker's target.
  //
  // Commit protocol: write `v=N.__staging` → rename to `v=N`
  // (atomic dir move) → stage-and-rename the marker. A crash between
  // the last two leaves a complete-but-unpublished `v=N`: invisible
  // to readers (marker still says N-1) and reclaimed by the next
  // writer (idempotent re-publish of N).

  private def versionDir(root: String, v: Long) = f"$root/v=$v%06d"

  /** The `v=N` directory path of the marker protocol — public so the
    * versioned ANN-index family ([[graft.operators.Clustering]]'s
    * retrain arc) can stage its multi-artifact version dirs under the
    * SAME layout and marker this table protocol uses. */
  def versionPath(root: String, v: Long): String = versionDir(root, v)

  /** Advance the `_latest` marker to `v` — the LAST step of every
    * publish (stage-and-rename; readers racing the writer see the old
    * or the new version, never a mix). Factored out of [[writeVersion]]
    * so non-DataFrame version dirs (the ANN index's index/codebooks/
    * stats triple) commit through the identical protocol. */
  def advanceLatest(spark: SparkSession, root: String, v: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$root/_latest")
    val tmp = new org.apache.hadoop.fs.Path(s"$root/_latest.__tmp")
    // the tmp must NEVER be visible mid-write: [[latestVersion]]'s heal
    // promotes a tmp it finds beside a missing marker, and on a FIRST
    // publish (no old marker gating the window) a reader racing this
    // create could promote a still-empty file — crashing itself on the
    // unparseable content and leaving the writer's recovery to delete
    // the healed marker. Write to a `.__part` name and RENAME into
    // place (atomic), so `_latest.__tmp` only ever exists complete —
    // the invariant the heal's scaladoc relies on.
    val part = new org.apache.hadoop.fs.Path(s"$root/_latest.__tmp.__part")
    val out = fs.create(part, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(tmp)) fs.delete(tmp, false)
    if (!fs.rename(part, tmp))
      throw new java.io.IOException(s"failed to stage marker tmp $part -> $tmp")
    if (fs.exists(marker)) fs.delete(marker, false)
    if (!fs.rename(tmp, marker)) {
      // a concurrent reader may have healed our own tmp into place
      // between the delete and the rename ([[latestVersion]]); if the
      // marker now carries v, the flip is complete — not a failure
      val healed = fs.exists(marker) && {
        val in = fs.open(marker)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim == v.toString
        finally in.close()
      }
      if (!healed)
        throw new java.io.IOException(s"failed to advance $marker to $v")
    }
  }

  /** The published version number, if any (crash-orphaned version
    * dirs beyond the marker do NOT count).
    *
    * Self-healing: [[advanceLatest]]'s flip is write-tmp → delete-old →
    * rename-tmp; a crash between the last two leaves NO marker with the
    * fully-written `.__tmp` beside it. Treating that as "no versions"
    * would be catastrophic — every open fails, and the NEXT publish
    * would compute version 1 and reclaim-DELETE the real published
    * v=000001. The tmp is only ever created complete (written and
    * closed before the old marker is touched), so promote it here. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val marker = new org.apache.hadoop.fs.Path(s"$root/_latest")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val tmp = new org.apache.hadoop.fs.Path(s"$root/_latest.__tmp")
      if (!fs.exists(tmp)) {
        // TOCTOU window: a racing advanceLatest can complete its
        // delete→rename between our two checks — no marker seen, then
        // no tmp either. Returning None here is the catastrophic state
        // the scaladoc names (a publisher acting on it computes v=1 and
        // reclaim-deletes the real generation); re-check the marker,
        // which the racing flip has by now renamed into place.
        if (!fs.exists(marker)) return None
      } else if (!fs.rename(tmp, marker) && !fs.exists(marker))
        throw new java.io.IOException(
          s"failed to heal crashed marker flip: $tmp exists but could not move to $marker")
    }
    val in = fs.open(marker)
    try Some(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
    finally in.close()
  }

  /** Publish `df` as the next version; returns the new version
    * number. Never touches published directories. */
  def writeVersion(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = latestVersion(spark, root).getOrElse(0L) + 1
    val target = new org.apache.hadoop.fs.Path(versionDir(root, next))
    val staging = new org.apache.hadoop.fs.Path(versionDir(root, next) + ".__staging")
    // a crashed prior attempt at THIS version (complete or partial)
    // is unpublished by definition — reclaim it
    if (fs.exists(target)) fs.delete(target, true)
    if (fs.exists(staging)) fs.delete(staging, true)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"failed to publish $staging as $target")
    advanceLatest(spark, root, next)
    next
  }

  /** Read a pinned `version`, or the latest published one when
    * omitted. Reading never consults directory listings — only the
    * marker — so crash-orphaned dirs can't leak into results. */
  def readVersion(spark: SparkSession, root: String, version: Long = -1L): DataFrame = {
    val v =
      if (version >= 0) version
      else latestVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(s"no published version under $root"))
    spark.read.parquet(versionDir(root, v))
  }

  /** Delete published versions older than the `keep` most recent
    * (always retains the marker's target). Returns the dropped
    * version numbers. */
  def pruneVersions(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, s"must keep at least the published version: $keep")
    val latest = latestVersion(spark, root).getOrElse(return Nil)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cut = latest - keep + 1
    val dropped = fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .filterNot(_.endsWith(".__staging"))
      .map(_.stripPrefix("v=").toLong)
      .filter(v => v < cut && v != latest)
      .sorted
    dropped.foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(versionDir(root, v)), true))
    dropped
  }

  /** TTL retention: rewrite a lake table keeping only rows matching
    * `keep` (e.g. `col("ts") >= expiry`) — the data-lifecycle
    * maintenance op that bounds incremental/streaming zones at scale
    * (pair with [[compact]]). The filter is a predicate-pushdown scan
    * (row groups entirely outside the retained range are skipped via
    * parquet statistics) and the swap rides [[overwriteSelf]], so
    * readers never see a half-expired table. Returns (rowsBefore,
    * rowsAfter). A partition-pruned layout (date-partitioned writes)
    * turns this into pure directory drops — this row-level form is
    * the fallback for unpartitioned or mid-partition expiry. */
  def expire(spark: SparkSession, path: String,
             keep: org.apache.spark.sql.Column,
             withCounts: Boolean = true): (Long, Long) = {
    healCrashedOverwrite(spark, path)
    val before = spark.read.parquet(path)
    if (!withCounts) { // pure pushdown rewrite: row groups outside the
      overwriteSelf(before.where(keep), path) // retained range skipped
      return (-1L, -1L)
    }
    // counts ride the rewrite as observe() metrics — ONE scan instead
    // of count-before + rewrite + count-after (three). The metrics
    // node pins the scan below the filter (no row-group skipping), so
    // at 100 TB with a highly-selective pushdown-able predicate,
    // withCounts=false is the cheaper call.
    val obs = org.apache.spark.sql.Observation()
    overwriteSelf(
      before.observe(obs, count(lit(1)).as("rows_before"),
          count(when(keep, lit(1))).as("rows_after"))
        .where(keep), path)
    (obs.get("rows_before").asInstanceOf[Long], obs.get("rows_after").asInstanceOf[Long])
  }

  /** Targeted key deletion ("right to be forgotten" / quarantine
    * removal): rewrite the table dropping every row whose key appears
    * in `keys` — an anti-join rewrite with the same atomic
    * [[overwriteSelf]] swap as [[expire]]. The join strategy is left
    * to AQE: a short deletion list broadcasts, a bulk one shuffles.
    * Returns (rowsBefore, rowsAfter). */
  def deleteKeys(spark: SparkSession, path: String,
                 keys: DataFrame, keyCol: String,
                 withCounts: Boolean = true): (Long, Long) = {
    healCrashedOverwrite(spark, path)
    val before = spark.read.parquet(path)
    val remaining = (df: DataFrame) =>
      df.join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    if (!withCounts) {
      overwriteSelf(remaining(before), path)
      return (-1L, -1L)
    }
    // both counts observed on the single rewrite pass: input rows
    // below the anti join, surviving rows above it
    val obsIn = org.apache.spark.sql.Observation()
    val obsOut = org.apache.spark.sql.Observation()
    overwriteSelf(
      remaining(before.observe(obsIn, count(lit(1)).as("n")))
        .observe(obsOut, count(lit(1)).as("n")), path)
    (obsIn.get("n").asInstanceOf[Long], obsOut.get("n").asInstanceOf[Long])
  }

  /** Readable-report CSV sink (reference: src/runnerfile.py:550-551
    * S8): single header CSV per report — reports are small by
    * construction (post-aggregation), so coalesce(1) is safe here and
    * gives the one-file layout the reference's consumers expect. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** JDBC URL + driver-class selection per dialect (reference:
    * src/common/database.py:30-39,90-99 — whose read path referenced
    * undefined attributes and could never run; this is the working
    * equivalent). */
  def jdbcUrl(dialect: String, host: String, port: Int, database: String): (String, String) =
    dialect.toLowerCase match {
      case "postgresql" | "postgres" =>
        (s"jdbc:postgresql://$host:$port/$database", "org.postgresql.Driver")
      case "mysql" =>
        (s"jdbc:mysql://$host:$port/$database", "com.mysql.cj.jdbc.Driver")
      case "sqlite" =>
        (s"jdbc:sqlite:$database", "org.sqlite.JDBC")
      case "derby" => // embedded: `database` is a directory path; host/port unused
        (s"jdbc:derby:$database;create=true", "org.apache.derby.jdbc.EmbeddedDriver")
      case other => throw new IllegalArgumentException(s"unsupported JDBC dialect: $other")
    }

  /** JDBC read options (reference: src/helpers/ingest_data.py:13-21,
    * src/common/database.py:85-110). Pure option-building — no live
    * database in this environment; exercised by unit tests. Also fixes
    * the reference's broken `read_table_to_df`
    * (src/common/database.py:90-99 references undefined attrs).
    *
    * The table name is validated as a (possibly schema-qualified)
    * identifier and passed directly as `dbtable` — no string-built
    * subquery, so no SQL-injection surface. The session-timezone
    * statement is dialect-specific, so it is opt-in via
    * `sessionInit` rather than hardwired PostgreSQL syntax. */
  def jdbcOptions(url: String, table: String, user: String, password: String,
                  driver: String, sessionInit: Option[String] = None): Map[String, String] = {
    require(table.matches("""[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?"""),
      s"illegal table identifier: $table")
    Map(
      "url" -> url,
      "dbtable" -> table,
      "user" -> user,
      "password" -> password,
      "driver" -> driver) ++ sessionInit.map("sessionInitStatement" -> _)
  }

  def jdbcRead(spark: SparkSession, opts: Map[String, String]): DataFrame =
    spark.read.format("jdbc").options(opts).load()

  /** Partition options for a PARALLEL JDBC read. The reference's own
    * production path is a ~25 M-row fact over JDBC
    * (reference: README.md:148, src/helpers/ingest_data.py:13-21) read
    * over ONE connection — at that scale the single-stream read IS the
    * ingest bottleneck, so this derives Spark's stride spec
    * (`partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`)
    * plus a `fetchsize` (row-batching per round-trip; the JDBC default
    * on several drivers is pathologically small or, for MySQL,
    * row-at-a-time).
    *
    * Semantics (Spark's, worth restating because they're misread):
    * the bounds control STRIDE ONLY, not filtering — the first and
    * last partitions take open-ended predicates, so rows outside
    * [lower, upper] still land. Bounds therefore only need to be
    * approximately right; a stale watermark still reads everything.
    * `idCol` must be a roughly-uniform numeric/date column (the
    * classic auto-increment id) or the stripes skew. */
  def jdbcPartitionOptions(idCol: String, lowerBound: Long, upperBound: Long,
                           numPartitions: Int,
                           fetchSize: Int = 10000): Map[String, String] = {
    require(idCol.matches("""[A-Za-z_][A-Za-z0-9_$]*"""),
      s"illegal partition column identifier: $idCol")
    require(numPartitions >= 1, s"numPartitions must be >= 1: $numPartitions")
    require(lowerBound <= upperBound,
      s"lowerBound $lowerBound > upperBound $upperBound")
    require(fetchSize > 0, s"fetchSize must be positive: $fetchSize")
    // A degenerate range can't stripe: Spark would emit one real
    // partition plus (n-1) empty ones; collapse to a clean single
    // stream instead of scheduling dead tasks.
    val parts = if (upperBound == lowerBound) 1 else numPartitions
    Map("fetchsize" -> fetchSize.toString) ++ (
      if (parts <= 1) Map.empty[String, String]
      else Map(
        "partitionColumn" -> idCol,
        "lowerBound" -> lowerBound.toString,
        "upperBound" -> upperBound.toString,
        "numPartitions" -> parts.toString))
  }

  /** The stride index Spark's JDBC source assigns a row under
    * [[jdbcPartitionOptions]] — JDBCRelation.columnPartition's
    * arithmetic as a column expression, so the watermark-slice +
    * stride semantics of [[jdbcIncrementalRead]] can be REPLAYED over
    * a parquet mirror of the source table (and oracled cross-engine,
    * which a live JDBC read can't be).
    *
    * Spark 4's arithmetic (SPARK-34843, derived here EMPIRICALLY from
    * live reads — the naive upper/n − lower/n stride misassigns rows
    * near every boundary): stride = (upper − lower) div n; the lower
    * bound is then ALIGNED up by half the lost remainder, shift =
    * ((upper − lower) mod n + 1) div 2 (so the first and last stripes
    * split the slack instead of the last one absorbing it all);
    * boundaries sit at lower + shift + i·stride with `>=`/`<`
    * predicates and open-ended first/last stripes. Expects LONG
    * columns named `idCol`/`lowerCol`/`upperCol` in scope; ids outside
    * [lower, upper] clamp to the end stripes (bounds steer, never
    * filter). Caveat: when upper − lower < n Spark REDUCES the
    * partition count instead — pass the effective n. LakeSpec pins
    * this formula to Spark's actual stripe assignment via
    * spark_partition_id over live Derby reads. */
  def strideIndex(idCol: String, lowerCol: String, upperCol: String,
                  numPartitions: Int): org.apache.spark.sql.Column = {
    Seq(idCol, lowerCol, upperCol).foreach(c =>
      require(c.matches("""[A-Za-z_][A-Za-z0-9_$]*"""),
        s"illegal column identifier: $c"))
    require(numPartitions >= 1, s"numPartitions must be >= 1: $numPartitions")
    val n = numPartitions.toLong
    val span = s"($upperCol - $lowerCol)"
    val stride = s"($span div $n)"
    val shift = s"((($span % $n) + 1) div 2)"
    expr(s"CAST(least(greatest(CASE WHEN $stride <= 0 THEN 0 " +
      s"ELSE ($idCol - $lowerCol - $shift) div $stride END, 0), ${n - 1}) AS INT)")
  }

  /** Probe MIN/MAX of `idCol` over one connection — a single-row
    * aggregate the database answers from the id index (primary key →
    * O(1) on every major RDBMS), NOT a table scan through Spark: the
    * v1 JDBC source doesn't push aggregates, so the probe is spelled
    * as a dbtable subquery the database executes itself. `idCol` and
    * the table identifier are both validated (no injection surface).
    * None when the table is empty. */
  def jdbcBounds(spark: SparkSession, opts: Map[String, String],
                 idCol: String): Option[(Long, Long)] = {
    require(idCol.matches("""[A-Za-z_][A-Za-z0-9_$]*"""),
      s"illegal partition column identifier: $idCol")
    val table = opts.getOrElse("dbtable",
      throw new IllegalArgumentException("opts missing dbtable"))
    require(table.matches("""[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?"""),
      s"illegal table identifier: $table")
    // Quote the COLUMN through Spark's own dialect registry: Spark's
    // JDBC writer quotes column identifiers at CREATE time, so a
    // Derby/Postgres table written by jdbcWrite has case-sensitive
    // lowercase columns an unquoted probe would upcase past (ID vs
    // "id"); the dialect picks the right quote char per database
    // (backticks on MySQL). The TABLE name stays verbatim — that is
    // exactly how Spark's own reader embeds opts("dbtable") into
    // `SELECT * FROM $table`, so quoting it here would resolve a
    // DIFFERENT table than the read it partitions.
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(opts.getOrElse("url", ""))
    val qId = dialect.quoteIdentifier(idCol)
    val probe = opts + ("dbtable" ->
      s"(SELECT MIN($qId) AS graft_mn, MAX($qId) AS graft_mx FROM $table) graft_bounds")
    val row = spark.read.format("jdbc").options(probe).load()
      .select(col("graft_mn").cast("long"), col("graft_mx").cast("long")).head()
    if (row.isNullAt(0)) None else Some((row.getLong(0), row.getLong(1)))
  }

  /** Parallel JDBC table read: probe the id bounds (or take them from
    * the caller — e.g. the incremental watermark), then read with
    * `numPartitions` concurrent connections striped over `idCol`.
    * Falls back to the single-stream read (still with `fetchsize`)
    * when the table is empty or has one distinct id. This is S3's
    * at-scale form; `jdbcRead` stays as the faithful-to-reference
    * single-connection path. */
  def jdbcReadPartitioned(spark: SparkSession, opts: Map[String, String],
                          idCol: String, numPartitions: Int,
                          fetchSize: Int = 10000,
                          bounds: Option[(Long, Long)] = None): DataFrame = {
    val b = bounds.orElse(jdbcBounds(spark, opts, idCol))
    val part = b match {
      case Some((lo, hi)) =>
        jdbcPartitionOptions(idCol, lo, hi, numPartitions, fetchSize)
      case None => Map("fetchsize" -> fetchSize.toString)
    }
    spark.read.format("jdbc").options(opts ++ part).load()
  }

  /** Incremental ingest, parallel form: everything strictly above the
    * max-id `watermark` (from [[maxWatermark]] over the landed data),
    * read over `numPartitions` connections. The watermark becomes BOTH
    * the pushed filter (`idCol > w` — the v1 JDBC source pushes
    * comparison filters into the WHERE clause, so the database skips
    * the already-landed prefix via the id index) AND the stride's
    * lower bound (stripes cover only the new slice, not the full id
    * domain — without this, w..max striped over 0..max lands every
    * new row in the last partition). First ingest (no watermark)
    * degrades to the full partitioned read. */
  def jdbcIncrementalRead(spark: SparkSession, opts: Map[String, String],
                          idCol: String, watermark: Option[Long],
                          numPartitions: Int,
                          fetchSize: Int = 10000): DataFrame = {
    // one bounds probe serves both the stride and (via min) the
    // no-watermark fallback
    val probed = jdbcBounds(spark, opts, idCol)
    val bounds = probed.map { case (mn, mx) =>
      // a watermark at/above max id would invert the stride; clamp —
      // the pushed filter below still guarantees zero stale rows
      (math.min(watermark.map(_ + 1L).getOrElse(mn), mx), mx)
    }
    val base = jdbcReadPartitioned(spark, opts, idCol, numPartitions,
      fetchSize, bounds)
    incrementalSlice(base, idCol, watermark)
  }

  /** JDBC publish (reference: src/common/database.py:43-83 S7,
    * src/helpers/consume_data.py:16-50): overwrite mode with a
    * pre-write repartition to bound per-connection batch size. */
  def jdbcWrite(df: DataFrame, opts: Map[String, String], numPartitions: Int = 8): Unit =
    df.repartition(numPartitions).write.format("jdbc")
      .options(opts).mode(SaveMode.Overwrite).save()
}
