package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

class LakeSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-lake").toString

  test("zone write/read round-trip with real partitionBy (reference dropped it)") {
    val root = tmp()
    val lake = Lake(s"$root/raw", s"$root/cleansed", s"$root/curated")
    val df = Lake.stampIngestDate(Seq((1, "a"), (2, "b")).toDF("id", "v"), 2026, 8, 12)
    lake.writeRaw(df, "t", Seq("year", "month", "day"))
    // hive-style partition directories must actually exist
    assert(new java.io.File(s"$root/raw/t/year=2026/month=8/day=12").exists())
    val back = lake.readRaw(spark, "t")
    assert(back.count() === 2)
    assert(back.columns.toSet === Set("id", "v", "year", "month", "day"))
  }

  test("date filters prune partitions at the scan (the point of S6)") {
    val root = tmp()
    val lake = Lake(s"$root/raw", s"$root/c", s"$root/cu")
    import org.apache.spark.sql.functions.col
    Seq(11, 12).foreach { day =>
      val df = Lake.stampIngestDate(Seq((day, "x")).toDF("id", "v"), 2026, 8, day)
      Lake.write(df, s"$root/raw/t/pending_$day", Nil) // build partitioned below
    }
    val both = Lake.stampIngestDate(Seq((1, "a")).toDF("id", "v"), 2026, 8, 11)
      .union(Lake.stampIngestDate(Seq((2, "b")).toDF("id", "v"), 2026, 8, 12))
    lake.writeRaw(both, "t", Seq("year", "month", "day"))
    val pruned = lake.readRaw(spark, "t").where(col("day") === 12)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("day#"),
      s"expected partition filters in scan:\n$scan")
    assert(pruned.count() === 1)
    // the pruned plan must read only the day=12 directory
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(day"))
  }

  test("overwriteSelf swaps via the Hadoop FileSystem API on a file:-qualified URI") {
    val dir = tmp()
    val path = s"file:$dir/t" // scheme-qualified: java.io.File would not resolve it
    Lake.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), path)
    val filtered = spark.read.parquet(path).where(col("id") > 1)
    Lake.overwriteSelf(filtered, path)
    assert(spark.read.parquet(path).count() === 2)
    // the swap must leave no staging/old residue behind
    assert(!new java.io.File(s"$dir/t.__staging").exists())
    assert(!new java.io.File(s"$dir/t.__old").exists())
  }

  test("overwriteSelf recovers from a leftover __old dir of a crashed prior run") {
    val dir = tmp()
    val path = s"$dir/t"
    Lake.write(Seq((1, "a")).toDF("id", "v"), path)
    Lake.write(Seq((99, "stale")).toDF("id", "v"), s"$path.__old") // crash residue
    Lake.overwriteSelf(spark.read.parquet(path).withColumn("v", lit("new")), path)
    val back = spark.read.parquet(path).as[(Int, String)].collect()
    assert(back.toSeq === Seq((1, "new")))
    assert(!new java.io.File(s"$path.__old").exists())
  }

  test("overwriteSelf self-heals a crash between move-aside and promote") {
    // simulate the mid-swap crash state: live path gone, data parked at .__old
    val dir = tmp()
    val path = s"$dir/t"
    Lake.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(s"$path.__old")))
    // a restarted caller heals FIRST (its own read of `path` would fail),
    // then reads and overwrites as normal
    assert(Lake.healCrashedOverwrite(spark, path))
    val filtered = spark.read.parquet(path).where(col("id") > 1)
    Lake.overwriteSelf(filtered, path)
    assert(spark.read.parquet(path).as[(Int, String)].collect().toSeq === Seq((2, "b")))
    assert(!new java.io.File(s"$path.__old").exists())
    // healthy state: heal is a no-op
    assert(!Lake.healCrashedOverwrite(spark, path))
  }

  test("ingestCsv infers schema, or applies an explicit one") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"), "id,name\n1,a\n2,b\n")
    val inferred = Lake.ingestCsv(spark, s"$dir/t.csv")
    assert(inferred.schema("id").dataType === IntegerType)
    val explicit = Lake.ingestCsv(spark, s"$dir/t.csv",
      Some(StructType(Seq(StructField("id", LongType), StructField("name", StringType)))))
    assert(explicit.schema("id").dataType === LongType)
    assert(explicit.count() === 2)
  }

  test("maxWatermark and incrementalSlice") {
    val existing = Seq(1L, 5L, 3L).toDF("id")
    assert(Lake.maxWatermark(existing, "id") === Some(5L))
    assert(Lake.maxWatermark(existing.where(lit(false)), "id") === None)
    val source = Seq(4L, 5L, 6L, 9L).toDF("id")
    val sliced = Lake.incrementalSlice(source, "id", Some(5L)).as[Long].collect()
    assert(sliced.sorted.toSeq === Seq(6L, 9L))
    // no watermark -> full source
    assert(Lake.incrementalSlice(source, "id", None).count() === 4)
  }

  test("snapshotDiff classifies added/removed/changed; unchanged rows dropped") {
    val prev = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "v", "m")
    val next = Seq((1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0)).toDF("id", "v", "m")
    val out = Lake.snapshotDiff(prev, next, Seq("id")).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
    // null-safe compare: null -> null is NOT a change, null -> value is
    val p2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "v")
    val n2 = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "v")
    val out2 = Lake.snapshotDiff(p2, n2, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out2.toSeq === Seq((2L, "changed")))
  }

  test("upsertByKey: updates win on collision, untouched rows survive, CDC loop closes") {
    val existing = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "v", "m")
    val updates = Seq((2L, "b", 99.0), (4L, "d", 40.0)).toDF("id", "v", "m")
    val merged = Lake.upsertByKey(existing, updates, Seq("id"))
    val rows = merged.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.toSeq === Seq((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)))
    // detect -> apply round-trip: the diff of existing vs merged is
    // exactly the update/add set
    val diff = Lake.snapshotDiff(existing, merged, Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(diff === Set((2L, "changed"), (4L, "added")))
  }

  test("upsertByKeyPartitioned rewrites only touched buckets; rest byte-identical") {
    val dir = tmp()
    val path = s"$dir/table"
    val n = 8
    val base = (1L to 40L).map(k => (k, s"v$k", k * 1.0)).toDF("id", "v", "m")
    Lake.writeKeyBucketed(base, path, Seq("id"), n)
    // per-file (name -> bytes) snapshot of every bucket directory
    def snapshot(): Map[String, Map[String, Array[Byte]]] =
      new java.io.File(path).listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().filter(_.isFile)
          .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath)).toMap
      }.toMap
    val before = snapshot()
    val updates = Seq((7L, "v7-new", 777.0), (41L, "v41", 41.0)).toDF("id", "v", "m")
    val touched = Lake.upsertByKeyPartitioned(spark, path, updates, Seq("id"), n)
    val expectedTouched = updates.select(Lake.keyBucket(Seq("id"), n))
      .distinct().as[Int].collect().toSeq.sorted
    assert(touched === expectedTouched)
    // merged-table contract identical to the in-memory upsertByKey
    val got = Lake.readKeyBucketed(spark, path)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val want = Lake.upsertByKey(base, updates, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === want.toSeq)
    // every untouched bucket's files are BYTE-identical (same names,
    // same contents) — the bounded-rewrite guarantee
    val after = snapshot()
    val touchedDirs = touched.map(k => s"${Lake.BucketCol}=$k").toSet
    val untouched = before.keySet.filterNot(touchedDirs)
    assert(untouched.nonEmpty, "test needs at least one untouched bucket")
    untouched.foreach { bucket =>
      val (b, a) = (before(bucket), after(bucket))
      assert(a.keySet === b.keySet, s"$bucket file set changed")
      b.foreach { case (f, bytes) =>
        assert(java.util.Arrays.equals(a(f), bytes), s"$bucket/$f bytes changed")
      }
    }
    // and the touched buckets did change
    assert(touchedDirs.exists(d => before.get(d) != after.get(d)))
    // no staging/aside residue
    assert(!new java.io.File(path + ".__staging").exists())
    assert(!new java.io.File(path + ".__aside").exists())
  }

  test("bucketed merge's existing-row read prunes to the touched partitions") {
    val dir = tmp()
    val path = s"$dir/table"
    Lake.writeKeyBucketed((1L to 100L).map(k => (k, k * 2)).toDF("id", "x"),
      path, Seq("id"), 8)
    // the exact read shape mergeIntoKeyBucketed builds for existing rows
    val touched = Seq(2, 5)
    val read = spark.read.parquet(path)
      .where(col(Lake.BucketCol).isin(touched.map(Int.box): _*))
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(Lake.BucketCol),
      s"touched-bucket read must prune partitions:\n$plan")
    // file-level proof: the executed scan reads exactly the touched
    // dirs' files (Dataset.inputFiles is pre-pruning, so use the scan
    // metric)
    read.collect() // execute THIS plan instance so its metrics populate
    val expectedFiles = touched.map(k =>
      new java.io.File(path, s"${Lake.BucketCol}=$k").listFiles()
        .count(_.getName.endsWith(".parquet"))).sum
    val numFiles = read.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    assert(numFiles === expectedFiles.toLong,
      s"scan must read only the touched buckets' files ($expectedFiles), read $numFiles")
  }

  test("upsertByKeyPartitioned equals upsertByKey for random update sets") {
    val dir = tmp()
    val n = 8
    val base = (1L to 60L).map(k => (k, s"v$k")).toDF("id", "v")
    // deterministic pseudo-random update sets: overlap + inserts + a
    // key colliding into every bucket over the runs
    val updateSets = Seq(
      Seq((5L, "a"), (61L, "b")),
      Seq((1L, "c"), (2L, "d"), (3L, "e"), (99L, "f")),
      (10L to 40L by 3).map(k => (k, s"u$k")))
    updateSets.zipWithIndex.foreach { case (ups, i) =>
      val path = s"$dir/t$i"
      Lake.writeKeyBucketed(base, path, Seq("id"), n)
      val updates = ups.toDF("id", "v")
      Lake.upsertByKeyPartitioned(spark, path, updates, Seq("id"), n)
      val got = Lake.readKeyBucketed(spark, path)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val want = Lake.upsertByKey(base, updates, Seq("id"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === want, s"update set $i diverged from the in-memory merge")
    }
  }

  test("healKeyBucketed restores a bucket parked mid-swap; clears stale parks") {
    val dir = tmp()
    val path = s"$dir/table"
    val n = 4
    Lake.writeKeyBucketed((1L to 20L).map(k => (k, k * 2)).toDF("id", "x"),
      path, Seq("id"), n)
    val buckets = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(buckets.length >= 2)
    val asideRoot = new java.io.File(path + ".__aside")
    asideRoot.mkdirs()
    // crash between move-aside and promote: live dir missing, park present
    val crashed = buckets.head
    java.nio.file.Files.move(
      java.nio.file.Paths.get(path, crashed),
      java.nio.file.Paths.get(asideRoot.toString, crashed))
    // crash after promote: live dir present AND a stale park of it
    val stale = buckets.last
    val staleDir = new java.io.File(asideRoot, stale)
    staleDir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(staleDir.toString, "junk.parquet"), "junk")
    val before = Lake.readKeyBucketed(spark, path) // heals on read
    assert(before.count() === 20)
    assert(new java.io.File(path, crashed).exists(), "parked bucket restored")
    assert(!staleDir.exists(), "stale park cleared")
  }

  test("ingestJson reads newline-delimited records, with or without a schema") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.json"),
      """{"id": 1, "name": "a"}
        |{"id": 2, "name": "b"}
        |""".stripMargin)
    val inferred = Lake.ingestJson(spark, s"$dir/t.json")
    assert(inferred.count() === 2)
    val explicit = Lake.ingestJson(spark, s"$dir/t.json",
      Some(StructType(Seq(StructField("id", LongType), StructField("name", StringType)))))
    assert(explicit.schema("id").dataType === LongType)
  }

  test("ORC round-trip with partitioning and predicate pushdown") {
    val dir = tmp()
    import org.apache.spark.sql.functions.col
    val df = Seq((1, "a", 10), (2, "b", 20)).toDF("id", "v", "part")
    Lake.writeOrc(df, s"$dir/t", Seq("part"))
    assert(new java.io.File(s"$dir/t/part=10").exists())
    val back = Lake.readOrc(spark, s"$dir/t").where(col("id") > 1)
    assert(back.count() === 1)
    assert(back.queryExecution.executedPlan.toString.contains("PushedFilters"))
  }

  test("writeCsv emits one header CSV readable back") {
    val dir = tmp()
    Lake.writeCsv(Seq((1, "a"), (2, "b")).toDF("id", "v"), s"$dir/report")
    val files = new java.io.File(s"$dir/report").listFiles.filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
    val back = Lake.ingestCsv(spark, s"$dir/report")
    assert(back.count() === 2 && back.columns.toSeq === Seq("id", "v"))
  }

  test("jdbcUrl per dialect; unsupported dialect rejected") {
    assert(Lake.jdbcUrl("postgresql", "h", 5432, "db") ===
      (("jdbc:postgresql://h:5432/db", "org.postgresql.Driver")))
    assert(Lake.jdbcUrl("mysql", "h", 3306, "db")._2 === "com.mysql.cj.jdbc.Driver")
    assert(Lake.jdbcUrl("sqlite", "", 0, "/tmp/x.db")._1 === "jdbc:sqlite:/tmp/x.db")
    intercept[IllegalArgumentException](Lake.jdbcUrl("oracle", "h", 1521, "db"))
  }

  test("live JDBC round-trip through embedded Derby (S3/S7 end-to-end)") {
    // Derby ships with Spark (hive-metastore dependency), so this is a
    // real in-process RDBMS exercising the same jdbcWrite/jdbcRead
    // paths a PostgreSQL deployment would use — not option-building.
    val dir = tmp()
    System.setProperty("derby.system.home", dir) // keeps derby.log out of the repo
    val (url, driver) = Lake.jdbcUrl("derby", "", 0, s"$dir/graftdb")
    val opts = Lake.jdbcOptions(url, "report", "app", "app", driver)
    val df = Seq((1L, "AAA", 10.5), (2L, "BBB", 20.25), (3L, "CCC", 0.0))
      .toDF("id", "brand", "cost")
    Lake.jdbcWrite(df, opts, numPartitions = 2)
    val back = Lake.jdbcRead(spark, opts)
    assert(back.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "AAA", 10.5), (2L, "BBB", 20.25), (3L, "CCC", 0.0)))
    // overwrite mode really replaces (the reference's publish contract)
    Lake.jdbcWrite(df.where(col("id") === 1), opts, numPartitions = 1)
    assert(Lake.jdbcRead(spark, opts).count() === 1)
  }

  test("partitioned JDBC read: parallel connections, identical rows, watermark slice") {
    val dir = tmp()
    System.setProperty("derby.system.home", dir)
    val (url, driver) = Lake.jdbcUrl("derby", "", 0, s"$dir/graftpart")
    val opts = Lake.jdbcOptions(url, "fact", "app", "app", driver)
    val df = (1L to 1000L).map(i => (i, s"v$i", i * 1.5)).toDF("id", "payload", "x")
    Lake.jdbcWrite(df, opts, numPartitions = 2)
    // bounds probe answers from the table, not a Spark scan
    assert(Lake.jdbcBounds(spark, opts, "id") === Some((1L, 1000L)))
    // numPartitions>1 read: really striped AND byte-identical to single-stream
    val par = Lake.jdbcReadPartitioned(spark, opts, "id", numPartitions = 4)
    assert(par.rdd.getNumPartitions === 4)
    val single = Lake.jdbcRead(spark, opts)
    assert(par.orderBy("id").collect().toSeq === single.orderBy("id").collect().toSeq)
    // incremental: watermark becomes pushed filter + stride lower bound
    val inc = Lake.jdbcIncrementalRead(spark, opts, "id",
      watermark = Some(900L), numPartitions = 3)
    assert(inc.agg(min(col("id")), max(col("id")), count(lit(1))).head().toSeq ===
      Seq(901L, 1000L, 100L))
    // the watermark predicate must reach the DATABASE (the whole point:
    // the db skips the landed prefix via its id index), not run as a
    // post-scan Spark filter
    val incPlan = inc.queryExecution.executedPlan.toString
    assert(incPlan.contains("PushedFilters") && incPlan.contains("GreaterThan"),
      s"watermark filter not pushed into the JDBC source:\n$incPlan")
    // no watermark → the full partitioned read
    assert(Lake.jdbcIncrementalRead(spark, opts, "id", None, 3).count() === 1000L)
    // watermark at/above max: clamped stride, empty slice, no crash
    assert(Lake.jdbcIncrementalRead(spark, opts, "id", Some(1000L), 3).count() === 0L)
  }

  test("strideIndex replays Spark's actual JDBC stripe assignment (live Derby read)") {
    val dir = tmp()
    System.setProperty("derby.system.home", dir)
    val (url, driver) = Lake.jdbcUrl("derby", "", 0, s"$dir/graftstride")
    // non-aligned id ranges so the REAL boundary arithmetic (floor
    // stride of the span + half-remainder lower alignment, SPARK-34843
    // — the naive up/n - lo/n stride misassigns rows at every
    // boundary) is actually exercised, at two partition counts
    for (((lo, up, n), tag) <- Seq(((17L, 913L, 5), "a"), ((1L, 1000L, 7), "b"))) {
      val opts = Lake.jdbcOptions(url, s"sfact$tag", "app", "app", driver)
      val df = (lo to up).map(i => (i, i * 2.0)).toDF("id", "x")
      Lake.jdbcWrite(df, opts, numPartitions = 2)
      val par = Lake.jdbcReadPartitioned(spark, opts, "id", numPartitions = n)
      assert(par.rdd.getNumPartitions === n)
      // the physical partition a row arrives on IS the stripe Spark's
      // JDBC source fetched it over (no shuffle in between); the column
      // formula must agree for EVERY row — this pins q_jdbc_strides'
      // parquet-mirror replay to the live-JDBC ground truth
      val got = par.select(col("id"),
          org.apache.spark.sql.functions.spark_partition_id().as("actual"))
        .withColumn("__lo", lit(lo)).withColumn("__up", lit(up))
        .withColumn("predicted", Lake.strideIndex("id", "__lo", "__up", n))
      assert(got.where(col("actual") =!= col("predicted")).count() === 0L,
        s"strideIndex drifted from Spark's live stripes for lo=$lo up=$up n=$n")
    }
    // ids outside [lo, up] clamp to the open-ended end stripes (the
    // stale-watermark contract: bounds steer, never filter)
    val clamp = spark.range(1).select(lit(3L).as("id"), lit(5000L).as("id2"),
        lit(17L).as("__lo"), lit(913L).as("__up"))
      .select(Lake.strideIndex("id", "__lo", "__up", 5).as("below"),
        Lake.strideIndex("id2", "__lo", "__up", 5).as("above")).head()
    assert(clamp.getInt(0) === 0 && clamp.getInt(1) === 4)
    intercept[IllegalArgumentException](Lake.strideIndex("id; DROP", "a", "b", 4))
    intercept[IllegalArgumentException](Lake.strideIndex("id", "a", "b", 0))
  }

  test("jdbcPartitionOptions derives the stride spec; degenerate ranges collapse") {
    val o = Lake.jdbcPartitionOptions("id", 10L, 5000L, 8, fetchSize = 500)
    assert(o === Map("fetchsize" -> "500", "partitionColumn" -> "id",
      "lowerBound" -> "10", "upperBound" -> "5000", "numPartitions" -> "8"))
    // single distinct id (lo == hi) cannot stripe — clean single stream
    assert(Lake.jdbcPartitionOptions("id", 7L, 7L, 8) === Map("fetchsize" -> "10000"))
    assert(Lake.jdbcPartitionOptions("id", 1L, 9L, 1) === Map("fetchsize" -> "10000"))
    intercept[IllegalArgumentException](Lake.jdbcPartitionOptions("id", 9L, 1L, 4))
    intercept[IllegalArgumentException](Lake.jdbcPartitionOptions("id; DROP", 1L, 9L, 4))
    intercept[IllegalArgumentException](Lake.jdbcPartitionOptions("id", 1L, 9L, 0))
    intercept[IllegalArgumentException](Lake.jdbcPartitionOptions("id", 1L, 9L, 4, 0))
    // bounds probe rejects an injectable column even before connecting
    intercept[IllegalArgumentException](
      Lake.jdbcBounds(spark, Map("dbtable" -> "t"), "id) FROM x; --"))
  }

  test("compact collapses a many-small-file table; data survives byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val path = s"$dir/t"
    val df = spark.range(0, 10000).selectExpr("id", "id % 97 AS v")
    df.repartition(16).write.parquet(path)
    def parquetFiles() = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parquetFiles() === 16)
    val (before, after) = Lake.compact(spark, path, targetFileBytes = 1L << 30)
    assert(before === 16 && after === 1)
    assert(parquetFiles() === 1)
    val back = spark.read.parquet(path)
    assert(back.count() === 10000)
    assert(back.agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0) ===
      df.agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0))
    // a small target splits output into multiple near-target files
    val (_, after2) = Lake.compact(spark, path,
      targetFileBytes = math.max(1L, new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.length).sum / 3))
    assert(after2 >= 3, s"expected >=3 output files, got $after2")
  }

  test("compact refuses a hive-partitioned layout instead of flattening it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-part").toString
    val path = s"$dir/t"
    spark.range(0, 100).selectExpr("id", "id % 3 AS p")
      .write.partitionBy("p").parquet(path)
    val e = intercept[IllegalArgumentException] {
      Lake.compact(spark, path)
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
    // leaf partitions compact fine
    val (_, after) = Lake.compact(spark, s"$path/p=0", targetFileBytes = 1L << 30)
    assert(after === 1)
  }

  // stage names (action callsites) of every job launched by `body` —
  // listener-fed, so wait for the event queue to settle
  private def stageNamesIn(body: => Unit): Seq[String] = {
    val names = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        names.synchronized { names ++= j.stageInfos.map(_.name); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      val deadline = System.nanoTime() + 3000000000L
      var last = -1
      while (System.nanoTime() < deadline && names.synchronized(names.length) != last) {
        last = names.synchronized(names.length)
        Thread.sleep(200)
      }
      names.synchronized(names.toSeq)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("expire drops rows outside the retention predicate, atomically") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-expire").toString
    val path = s"$dir/t"
    spark.range(0, 1000).selectExpr("id", "id % 30 AS age_days").write.parquet(path)
    var result: (Long, Long) = null
    val stages = stageNamesIn {
      result = Lake.expire(spark, path, col("age_days") < 7)
    }
    // counts ride the rewrite as observe() metrics: no `count at` action
    // jobs (the old shape ran count + rewrite + count), and exactly one
    // write pass over the table
    assert(!stages.exists(_.startsWith("count at")),
      s"expire must not run count() scans: $stages")
    assert(stages.count(_.contains("parquet at Lake")) <= 2, // ≤1 footer read + 1 write
      s"expire must be a single rewrite pass: $stages")
    val (before, after) = result
    assert(before === 1000L)
    assert(after === spark.read.parquet(path).count())
    val back = spark.read.parquet(path)
    assert(back.where(col("age_days") >= 7).count() === 0L)
    assert(back.count() === (0 until 1000).count(_ % 30 < 7))
    // no staging/old residue after the swap
    val residue = new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.endsWith(".__staging") || n.endsWith(".__old"))
    assert(residue.isEmpty, residue.mkString(","))
  }

  test("deleteKeys removes exactly the listed keys, including repeats") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-delete").toString
    val path = s"$dir/t"
    spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v").write.parquet(path)
    // duplicate and irrelevant entries in the deletion list are harmless
    val keys = Seq(3L, 7L, 7L, 999L).toDF("k")
    var result: (Long, Long) = null
    val stages = stageNamesIn {
      result = Lake.deleteKeys(spark, path, keys, "k")
    }
    // counts come from observe() metrics on the one rewrite pass —
    // never the old count + rewrite + count table rescans
    assert(!stages.exists(_.startsWith("count at")),
      s"deleteKeys must not run count() scans: $stages")
    val (before, after) = result
    assert(before === 100L && after === 98L)
    val left = spark.read.parquet(path)
    assert(left.where(col("k").isin(3L, 7L)).count() === 0L)
    assert(left.count() === 98L)
  }

  test("jdbcOptions builds options and rejects injection") {
    val opts = Lake.jdbcOptions("jdbc:postgresql://h/db", "public.users", "u", "p",
      "org.postgresql.Driver", sessionInit = Some("SET TIME ZONE 'UTC'"))
    assert(opts("dbtable") === "public.users")
    assert(opts("sessionInitStatement") === "SET TIME ZONE 'UTC'")
    val noInit = Lake.jdbcOptions("jdbc:postgresql://h/db", "users", "u", "p", "d")
    assert(!noInit.contains("sessionInitStatement"))
    intercept[IllegalArgumentException] {
      Lake.jdbcOptions("url", "users; DROP TABLE users", "u", "p", "d")
    }
    intercept[IllegalArgumentException] {
      Lake.jdbcOptions("url", "(SELECT * FROM x)", "u", "p", "d")
    }
  }

  test("snapshot versioning: immutable versions, time travel, atomic marker") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-versions").toString
    assert(Lake.latestVersion(spark, root) === None)
    intercept[java.util.NoSuchElementException] { Lake.readVersion(spark, root) }
    assert(Lake.writeVersion(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root) === 1L)
    assert(Lake.writeVersion(Seq((1L, "a2"), (3L, "c")).toDF("k", "v"), root) === 2L)
    assert(Lake.latestVersion(spark, root) === Some(2L))
    // latest reads v2; the pinned v1 read is byte-stable after v2 published
    assert(Lake.readVersion(spark, root).as[(Long, String)].collect().toSet
      === Set((1L, "a2"), (3L, "c")))
    assert(Lake.readVersion(spark, root, 1).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b")))
  }

  test("snapshot versioning: crash-orphaned version dirs stay invisible and are reclaimed") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-versions-crash").toString
    Lake.writeVersion(Seq((1L, "a")).toDF("k", "v"), root)
    // simulate a writer that completed the v2 directory but crashed
    // BEFORE advancing the marker
    Seq((9L, "ghost")).toDF("k", "v").write.parquet(f"$root/v=${2L}%06d")
    assert(Lake.latestVersion(spark, root) === Some(1L))
    assert(Lake.readVersion(spark, root).as[(Long, String)].collect().toSet
      === Set((1L, "a")), "readers must not see the unpublished version")
    // the next publish reclaims the orphaned number with fresh content
    assert(Lake.writeVersion(Seq((2L, "real")).toDF("k", "v"), root) === 2L)
    assert(Lake.readVersion(spark, root).as[(Long, String)].collect().toSet
      === Set((2L, "real")), "the ghost content must be gone")
  }

  test("buildOnce: skips on a matching stamp, rebuilds when the source fingerprint changes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-build-once").toString
    var builds = 0
    def build(payload: Long): Unit = {
      builds += 1
      Seq(payload).toDF("v").write.mode("overwrite").parquet(dir)
    }
    // first call: no cache -> builds and stamps
    Lake.buildOnce(dir, "src:100") { build(1L) }
    assert(builds === 1)
    // same fingerprint: cache hit, no rebuild
    Lake.buildOnce(dir, "src:100") { build(2L) }
    assert(builds === 1)
    assert(spark.read.parquet(dir).as[Long].head() === 1L)
    // the SOURCE MUTATES (regenerated in place -> row count changes):
    // the stale-cache trap the stamp exists for — must rebuild
    Lake.buildOnce(dir, "src:250") { build(3L) }
    assert(builds === 2, "a changed source fingerprint must force a rebuild")
    assert(spark.read.parquet(dir).as[Long].head() === 3L,
      "readers must see the rebuilt cache, not the dead corpus's rows")
    // a cache directory missing _SUCCESS (crashed build) also rebuilds
    new java.io.File(dir, "_SUCCESS").delete()
    Lake.buildOnce(dir, "src:250") { build(4L) }
    assert(builds === 3, "a _SUCCESS-less cache must rebuild even with a matching stamp")
  }

  test("latestVersion heals a crashed marker flip from the surviving tmp") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-versions-flip").toString
    Lake.writeVersion(Seq((1L, "a")).toDF("k", "v"), root)
    Lake.writeVersion(Seq((2L, "b")).toDF("k", "v"), root)
    // simulate advanceLatest crashing between delete-old and rename-tmp:
    // no _latest, but the fully-written _latest.__tmp survives
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$root/_latest")
    val tmp = new org.apache.hadoop.fs.Path(s"$root/_latest.__tmp")
    val out = fs.create(tmp, true)
    out.write("2".getBytes(java.nio.charset.StandardCharsets.UTF_8)); out.close()
    fs.delete(marker, false)
    // WITHOUT the heal this reads None — and the next publish would
    // compute version 1 and DELETE the real published v=000001
    assert(Lake.latestVersion(spark, root) === Some(2L),
      "a crashed marker flip must heal from the tmp, not orphan every version")
    assert(Lake.readVersion(spark, root).as[(Long, String)].collect().toSet
      === Set((2L, "b")))
    // and the next publish lands v3 — v1/v2 untouched
    assert(Lake.writeVersion(Seq((3L, "c")).toDF("k", "v"), root) === 3L)
    assert(Lake.readVersion(spark, root, 1).as[(Long, String)].collect().toSet
      === Set((1L, "a")), "published generations must survive the healed flip")
  }

  test("marker-flip crash law: no crash point x next action ever deletes a published generation") {
    // the commit-class hazard pinned as a LAW instead of a single fix:
    // advanceLatest's flip is write-tmp -> delete-old-marker ->
    // rename-tmp. Enumerate every crash point of a v1 -> v2 flip (the
    // v2 dir itself is already fully renamed when the flip starts),
    // then every next actor (a reader; a racing next publish), and
    // assert the invariants: latestVersion never returns None, the
    // reader resolves a PUBLISHED generation (1 or 2, never a mix),
    // and after the next publish every generation the marker ever
    // covered is still readable — the catastrophic interleaving is the
    // one where a publisher computes v=1 and reclaim-deletes real data.
    import spark.implicits._
    val fsConf = spark.sparkContext.hadoopConfiguration
    // crash states: what's on disk after advanceLatest(2) stops at each
    // point (marker content, tmp content)
    val crashStates = Seq(
      "after-tmp-write" -> (Some("1"), Some("2")),
      "after-delete-old" -> (None, Some("2")),
      "after-rename" -> (Some("2"), None))
    for ((label, (markerV, tmpV)) <- crashStates; readerFirst <- Seq(true, false)) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-flip-law-$label").toString
      Lake.writeVersion(Seq((1L, "a")).toDF("k", "v"), root)
      // v2's data dir is fully published-but-unmarked (the flip is the
      // last step of writeVersion); build that state by hand
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(fsConf)
      Seq((2L, "b")).toDF("k", "v").write.parquet(s"$root/v=000002")
      val marker = new org.apache.hadoop.fs.Path(s"$root/_latest")
      val tmp = new org.apache.hadoop.fs.Path(s"$root/_latest.__tmp")
      def put(p: org.apache.hadoop.fs.Path, v: Option[String]): Unit = {
        fs.delete(p, false)
        v.foreach { s =>
          val out = fs.create(p, true)
          try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
      }
      put(marker, markerV)
      put(tmp, tmpV)
      def readerInvariant(allowed: Long => Boolean, what: String): Unit = {
        val seen = Lake.latestVersion(spark, root)
        assert(seen.exists(allowed),
          s"$label: a reader must resolve $what, got $seen")
        assert(Lake.readVersion(spark, root).count() === 1L,
          s"$label: the resolved generation must be readable")
      }
      // a reader racing the crashed flip resolves generation 1 or 2 —
      // never None, never a mix
      if (readerFirst)
        readerInvariant(v => v == 1L || v == 2L, "a published generation (1|2)")
      // the racing next publish: whatever generation it lands on, it
      // must never delete data a marker ever covered
      val next = Lake.writeVersion(Seq((9L, "c")).toDF("k", "v"), root)
      assert(next >= 2L,
        s"$label: the next publish must never compute v=1 over published data")
      // a reader AFTER the racing publish sees exactly that publish
      if (!readerFirst)
        readerInvariant(_ == next, s"the racing publish's generation $next")
      assert(Lake.readVersion(spark, root, 1).as[(Long, String)].collect().toSet
        === Set((1L, "a")),
        s"$label: generation 1 must survive every interleaving")
      // after-rename means v2 was PUBLISHED (marker said 2): it must
      // survive the next publish; in the two earlier states v2 was
      // never committed, so reclaiming it is correct behavior
      if (markerV.contains("2"))
        assert(Lake.readVersion(spark, root, 2).as[(Long, String)].collect().toSet
          === Set((2L, "b")),
          s"$label: the committed generation 2 must survive the next publish")
      assert(Lake.readVersion(spark, root, next).as[(Long, String)]
        .collect().toSet === Set((9L, "c")))
    }
  }

  test("fingerprintCached memoizes per (session, key); distinct keys stay distinct") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fp-cache").toString
    Seq(1L, 2L, 3L).toDF("v").write.parquet(s"$dir/t")
    val key = s"$dir/t" // the caller's contract: the key names the source
    val fp1 = Lake.fingerprintCached(spark.read.parquet(s"$dir/t"), key)
    assert(fp1 === Lake.fingerprint(spark.read.parquet(s"$dir/t")))
    // in-place regeneration WITHIN the session: the memo serves the old
    // stamp (documented trade — the scan is paid once per session); a
    // different key still scans fresh
    Seq(7L, 8L).toDF("v").write.mode("overwrite").parquet(s"$dir/t")
    assert(Lake.fingerprintCached(spark.read.parquet(s"$dir/t"), key) === fp1)
    val fp2 = Lake.fingerprintCached(spark.read.parquet(s"$dir/t"), key + "#2")
    assert(fp2 !== fp1)
    assert(fp2 === Lake.fingerprint(spark.read.parquet(s"$dir/t")))
  }

  test("pruneVersions keeps the newest k and never the published target") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-versions-prune").toString
    (1 to 4).foreach(i => Lake.writeVersion(Seq((i.toLong, s"v$i")).toDF("k", "v"), root))
    assert(Lake.pruneVersions(spark, root, keep = 2) === Seq(1L, 2L))
    assert(Lake.readVersion(spark, root, 3).count() === 1L, "kept versions still read")
    assert(Lake.readVersion(spark, root).as[(Long, String)].head() === ((4L, "v4")))
    intercept[org.apache.spark.sql.AnalysisException] {
      Lake.readVersion(spark, root, 1).count()
    }
    intercept[IllegalArgumentException] { Lake.pruneVersions(spark, root, keep = 0) }
  }
}
