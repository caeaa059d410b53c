package graft.ml

import graft.SparkSuite

class NaiveBayesSpec extends SparkSuite {
  import spark.implicits._

  test("predict separates two vocab-disjoint classes") {
    val train = Seq(
      (1L, "the cat sat on the mat", "en"), (2L, "the dog sat by the door", "en"),
      (3L, "le chat dort sur le lit", "fr"), (4L, "le chien mange le pain", "fr"))
      .toDF("doc_id", "text", "lang")
    val test = Seq((10L, "the cat by the door"), (11L, "le chat et le chien"))
      .toDF("doc_id", "text")
    val out = NaiveBayes.predict(train, test)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(10L -> "en", 11L -> "fr"))
  }

  test("unseen-vocabulary doc falls back to the prior-heavier class") {
    // test tokens appear in NO training doc -> every likelihood term
    // is the smoothing floor 1/(tot_c + V); class token totals are
    // EQUAL by construction (4 each), so only the prior separates
    val train = Seq(
      (1L, "alpha", "en"), (2L, "beta", "en"), (3L, "alpha", "en"), (4L, "beta", "en"),
      (5L, "uno dos", "fr"), (6L, "uno dos", "fr"))
      .toDF("doc_id", "text", "lang")
    val test = Seq((10L, "zzz qqq")).toDF("doc_id", "text")
    val out = NaiveBayes.predict(train, test).collect()
    assert(out.head.getString(1) === "en") // 4 en docs > 2 fr docs
  }

  test("predict is invariant to partitioning and row order") {
    val train = (1L to 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3}", if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "text", "lang")
    val test = (100L to 120L).map(i => (i, s"tok${i % 7} tok${i % 4}"))
      .toDF("doc_id", "text")
    val a = NaiveBayes.predict(train, test).orderBy("doc_id").collect().toSeq
    val b = NaiveBayes.predict(train.repartition(13), test.repartition(7))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("confusion totals the held-out fold exactly") {
    val docs = (1L to 50L).map(i =>
      (i, if (i % 2 == 0) "x y z x" else "p q r p",
        if (i % 2 == 0) "even" else "odd")).toDF("doc_id", "text", "lang")
    val cm = NaiveBayes.confusion(docs, folds = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // held-out = doc_id % 5 == 0 -> 10 docs, classes fully separable
    assert(cm.values.sum === 10L)
    assert(cm(("even", "even")) === 5L && cm(("odd", "odd")) === 5L)
    assert(!cm.contains(("even", "odd")) && !cm.contains(("odd", "even")))
  }

  test("metrics: perfect separation scores 1.0 across the sheet") {
    val docs = (1L to 50L).map(i =>
      (i, if (i % 2 == 0) "x y z x" else "p q r p",
        if (i % 2 == 0) "even" else "odd")).toDF("doc_id", "text", "lang")
    val m = NaiveBayes.metrics(docs, folds = 5).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(m("even") === ((5L, 5L, 5L, 1.0, 1.0, 1.0)))
    assert(m("odd") === ((5L, 5L, 5L, 1.0, 1.0, 1.0)))
  }

  test("summary: perfect separation kappa 1; majority-collapse kappa 0") {
    val sep = (1L to 50L).map(i =>
      (i, if (i % 2 == 0) "x y z x" else "p q r p",
        if (i % 2 == 0) "even" else "odd")).toDF("doc_id", "text", "lang")
    val r = NaiveBayes.summary(sep, folds = 5).head()
    assert(r.getLong(0) === 10L)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 1.0)
    // identical text everywhere -> the model predicts one class for
    // all: accuracy equals that class's share, kappa exactly 0
    // (chance-corrected agreement sees through the majority vote)
    val flat = (1L to 40L).map(i =>
      (i, "same same", if (i % 4 == 0) "rare" else "common"))
      .toDF("doc_id", "text", "lang")
    val f = NaiveBayes.summary(flat, folds = 5).head()
    assert(f.getDouble(1) < 1.0)
    assert(f.getDouble(2) === 0.0)
  }

  test("metrics: never-predicted class gets null precision/f1, zero recall") {
    // class "rare" appears in the held-out fold but its vocabulary is
    // swamped by "common" training mass -> never predicted
    val docs = (1L to 40L).map { i =>
      if (i == 5L) (i, "c c c", "rare") else (i, "c c c", "common")
    }.toDF("doc_id", "text", "lang")
    val rows = NaiveBayes.metrics(docs, folds = 5).collect()
      .map(r => r.getString(0) -> r).toMap
    val rare = rows("rare")
    assert(rare.getLong(1) === 0L)       // tp
    assert(rare.getLong(3) === 0L)       // predicted_n
    assert(rare.isNullAt(4))             // precision 0/0 -> null
    assert(rare.getDouble(5) === 0.0)    // recall 0
    assert(rare.isNullAt(6))             // f1 null
    val common = rows("common")
    assert(common.getDouble(5) === 1.0)  // all commons recalled
  }
}
