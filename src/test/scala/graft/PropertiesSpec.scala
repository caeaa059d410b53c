package graft

import org.scalacheck.Gen

import graft.expressions.{DistinctShingles, JaccardSim}
import graft.operators.{Dedup, Skew}

/** Property-based checks (SURVEY.md §5.1): algebraic laws that must
  * hold for any input, not just the fixtures. Uses ScalaCheck
  * generators sampled in-loop (the scalatest bridge artifact is not in
  * the offline cache). Expression properties run through the
  * interpreted eval path directly; DataFrame laws use bounded
  * generated tables. */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val text =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString)

  test("property: shingle sets are deduplicated and cover the text") {
    samples(text, 100).foreach { s =>
      val arr = DistinctShingles.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 5)
      val shingles = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      assert(shingles.distinct === shingles, s"dups for input '$s'")
      if (s.length > 5) assert(shingles.forall(s.contains(_)), s"foreign shingle for '$s'")
    }
  }

  test("property: jaccard is symmetric, bounded, and 1 on self") {
    val arrGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")).map(_.distinct)
    def ad(xs: Seq[String]) = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      xs.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
    samples(Gen.zip(arrGen, arrGen), 200).foreach { case (a, b) =>
      val ab = JaccardSim.compute(ad(a), ad(b))
      val ba = JaccardSim.compute(ad(b), ad(a))
      assert(ab === ba, s"asymmetric for $a / $b")
      assert(ab >= 0.0 && ab <= 1.0)
      if (a.nonEmpty) assert(JaccardSim.compute(ad(a), ad(a)) === 1.0)
    }
  }

  test("property: exact dedup is idempotent") {
    samples(Gen.listOfN(30, Gen.choose(0, 5)), 5).foreach { xs =>
      val df = xs.toDF("v")
      val once = Dedup.exact(df)
      assert(once.count() === Dedup.exact(once).count())
      assert(once.count() === xs.distinct.size.toLong)
    }
  }

  test("property: connectedKeepers equals brute-force transitive closure") {
    // reference: repeated relaxation over an adjacency map until fixpoint
    def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var lab = nodes.map(n => n -> n).toMap
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(lab(a), lab(b))
          if (lab(a) != m) { lab += a -> m; changed = true }
          if (lab(b) != m) { lab += b -> m; changed = true }
        }
      }
      lab
    }
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)).suchThat(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))))
    samples(edgeGen, 8).foreach { edges =>
      val df = edges.toDF("doc_a", "doc_b")
      val got = Dedup.connectedKeepers(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === brute(edges), s"union-find mismatch for $edges")
    }
    // the distributed path obeys the same law (one sampled case — each
    // run costs whole Spark jobs)
    samples(edgeGen, 1).foreach { edges =>
      val df = edges.toDF("doc_a", "doc_b")
      val got = Dedup.connectedKeepers(df, driverMaxPairs = 0).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === brute(edges), s"label-propagation mismatch for $edges")
    }
  }

  test("property: salted sum equals the plain sum for any grouping") {
    val rowsGen = Gen.listOfN(40, Gen.zip(Gen.oneOf("x", "y"), Gen.choose(0, 10000)))
    samples(rowsGen, 5).foreach { rows =>
      val df = rows.map { case (k, v) => (k, v / 100.0) }.toDF("k", "v")
      val salted = Skew.saltedSum(df, "k", "v").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val plain = rows.groupBy(_._1).view
        .mapValues(g => g.map(x => BigDecimal(x._2) / 100).sum.toDouble).toMap
      assert(salted === plain)
    }
  }

  test("property: DDSketch alpha bound holds for arbitrary signed multisets") {
    import graft.expressions.{DDSketch, DDSketchAggregator}
    val agg = new DDSketchAggregator[Double](Double.box, 0.02)
    val values = Gen.listOfN(200, Gen.oneOf(
      Gen.choose(-1e6, -1e-3), Gen.const(0.0), Gen.choose(1e-3, 1e6)))
    samples(values, 20).foreach { xs =>
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      val sorted = xs.sorted
      for (q <- Seq(0.0, 0.25, 0.5, 0.75, 0.99, 1.0)) {
        val truth = sorted((q * (xs.size - 1)).toLong.toInt)
        val est = DDSketch.quantile(buf, q, 0.02)
        // sign-preserving relative bound (exact for the zero bucket)
        assert(math.abs(est - truth) <= 0.02 * math.abs(truth) + 1e-9,
          s"q=$q est=$est truth=$truth n=${xs.size}")
      }
      // shard-merge == whole for a random split point too
      val (a, b) = xs.splitAt(xs.size / 3)
      assert(agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce)) === buf)
    }
  }

  test("property: media header parsers never throw — arbitrary and mutated bytes") {
    import graft.multimodal.{ImageHeader, Mp4Header}
    val junk = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    // pure garbage: a billion-row scan meets every byte sequence there is
    samples(junk, 300).foreach { b =>
      ImageHeader.parse(b); ImageHeader.parseWav(b); Mp4Header.parse(b)
    }
    // near-valid: real container bytes with one mutated byte — the
    // nastier corruption class (magic intact, structure lying)
    val builders = Seq[Array[Byte]](
      ImageHeader.pngBytes(640, 480), ImageHeader.gifBytes(33, 44),
      ImageHeader.bmpBytes(100, 100), ImageHeader.wavBytes(44100, 2, 16, 1000),
      Mp4Header.mp4Bytes("isom", 1000, 12345, 1280, 720))
    val mut = Gen.zip(Gen.choose(0, 1000), Gen.choose(Byte.MinValue, Byte.MaxValue))
    builders.foreach { base =>
      samples(mut, 200).foreach { case (pos, v) =>
        val b = base.clone(); b(pos % b.length) = v
        ImageHeader.parse(b); ImageHeader.parseWav(b); Mp4Header.parse(b)
      }
      // every truncation prefix parses to None or a value, never throws
      (0 to base.length).foreach { n =>
        ImageHeader.parse(base.take(n)); ImageHeader.parseWav(base.take(n))
        Mp4Header.parse(base.take(n))
      }
    }
  }
}
