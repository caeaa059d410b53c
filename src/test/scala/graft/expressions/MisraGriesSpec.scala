package graft.expressions

import scala.util.Random

import org.apache.spark.sql.functions.col

import graft.SparkSuite
import graft.operators.Profile

class MisraGriesSpec extends SparkSuite {
  import spark.implicits._

  /** Sequential reference run of the aggregator over a stream split
    * into `parts` chunks, merged pairwise — models Spark's partial
    * aggregation with arbitrary partitioning. */
  private def runSplit(agg: MisraGriesAggregator, items: Seq[String], parts: Int): MGBuf = {
    val chunks = items.grouped(math.max(1, items.size / parts)).toSeq
    chunks.map(_.foldLeft(agg.zero)(agg.reduce)).foldLeft(agg.zero)(agg.merge)
  }

  test("undercount bound and superset guarantee hold on a skewed stream") {
    val rnd = new Random(7)
    // 4 heavy items + a long tail of 500 distinct light items
    val heavy = Seq.fill(400)("h1") ++ Seq.fill(300)("h2") ++
      Seq.fill(250)("h3") ++ Seq.fill(200)("h4")
    val tail = (0 until 1000).map(i => s"t${rnd.nextInt(500)}")
    val stream = rnd.shuffle(heavy ++ tail)
    val n = stream.size
    val k = 16
    val agg = new MisraGriesAggregator(k)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

    for (parts <- Seq(1, 3, 8)) {
      val buf = runSplit(agg, stream, parts)
      assert(buf.n === n.toLong)
      assert(buf.counts.size <= k)
      // every tracked count undercounts truth by at most n/(k+1)
      buf.counts.foreach { case (w, c) =>
        assert(c <= truth(w), s"$w overcounted at parts=$parts")
        assert(truth(w) - c <= n / (k + 1), s"$w bound broken at parts=$parts")
      }
      // every true heavy hitter (> n/(k+1)) is present
      truth.collect { case (w, c) if c > n.toDouble / (k + 1) => w }
        .foreach(w => assert(buf.counts.contains(w), s"missing $w at parts=$parts"))
    }
  }

  test("merge caps the buffer at k and never overcounts") {
    val k = 4
    val agg = new MisraGriesAggregator(k)
    val a = (0 until 10).map(i => s"a$i").foldLeft(agg.zero)(agg.reduce)
    val b = (0 until 10).map(i => s"b$i").foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(a, b)
    assert(m.counts.size <= k)
    assert(m.n === 20L)
    assert(m.counts.values.forall(_ > 0))
  }

  test("heavyHitters == exact GROUP BY/HAVING when distinct keys exceed capacity") {
    val rnd = new Random(11)
    // 3 items above the threshold, 200 distinct below it; capacity 8
    // forces real decrement/merge activity (distinct >> k)
    val rows = Seq.fill(500)("big") ++ Seq.fill(400)("mid") ++ Seq.fill(350)("low") ++
      (0 until 800).map(_ => s"z${rnd.nextInt(200)}")
    val df = rnd.shuffle(rows).toDF("item")
    val n = rows.size
    val k = 8
    val got = Profile.heavyHitters(df, "item", k).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }
      .toSeq.sortBy { case (w, c) => (-c, w) }
    assert(got.toSeq === want)
  }

  test("heavyHitters on an empty frame returns no rows") {
    val df = Seq.empty[String].toDF("item")
    assert(Profile.heavyHitters(df, "item", 4).count() === 0L)
  }

  test("the aggregator streams: micro-batch partials preserve the MG guarantee") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mg-stream").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val rnd = new Random(31)
    val items = Seq.fill(300)("hot") ++ Seq.fill(220)("warm") ++
      (0 until 600).map(_ => s"c${rnd.nextInt(120)}")
    val shuffled = rnd.shuffle(items)
    // 4 files -> 4 micro-batches: state must merge across triggers
    shuffled.grouped(280).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("item").coalesce(1).write.parquet(s"$dir/in/b$i")
    }
    val schema = spark.read.parquet(s"$dir/in/b0").schema
    val k = 8
    val agg = new MisraGriesAggregator(k)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      .as[String].select(agg.toColumn.name("mg"))
    val q = stream.writeStream.format("memory").queryName("mgstream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // the typed result flattens to (counts, n) columns in the sink
    val buf = spark.sql("SELECT counts, n FROM mgstream").as[MGBuf].head()
    val n = items.size
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(buf.n === n.toLong)
    assert(buf.counts.size <= k)
    buf.counts.foreach { case (w, c) =>
      assert(c <= truth(w) && truth(w) - c <= n / (k + 1),
        s"bound broken for $w after streaming")
    }
    truth.collect { case (w, c) if c > n.toDouble / (k + 1) => w }
      .foreach(w => assert(buf.counts.contains(w), s"streamed summary lost $w"))
  }

  test("heavyHitters ignores nulls and casts non-string keys") {
    val df = Seq(Some(1), Some(1), Some(1), Some(2), None).toDF("item")
    val got = Profile.heavyHitters(df, "item", 4).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // n=4 non-null items, threshold n/5 → both keys qualify
    assert(got.toSeq === Seq(("1", 3L), ("2", 1L)))
  }
}
