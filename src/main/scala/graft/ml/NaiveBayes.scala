package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Text

/** Multinomial Naive Bayes as PURE dataflow ([EXT]) — train and
  * predict are aggregates and joins, no driver-side model object, no
  * iteration: per-(class, term) counts + Laplace smoothing give the
  * likelihoods, document scores are decimal sums of rounded log
  * contributions, and the argmax is a window rank. That makes the
  * whole train→predict→evaluate chain an ORACLE-CERTIFIABLE query —
  * unlike the gradient-descent baseline in [[Baseline]], whose float
  * accumulation order no cross-engine replay can pin.
  *
  * Reference scope: the reference's sklearn baseline-model tail
  * (reference: src/baseline_model.py) trains single-node on a 10k-row
  * sample; this is the distributed-classifier shape that needs no
  * sample cap.
  *
  * Determinism: every contribution `tf · ln((c_tc+1)/(c_t+V))` and
  * the prior `ln(n_c/N)` are rounded to 6dp THEN summed as
  * DECIMAL(18,6) (the dsum convention — summation-order independent,
  * engine-exact), so class scores compare exactly and the argmax
  * (row_number over score DESC, class DESC) picks the same class in
  * every engine, every run, every partitioning.
  *
  * Scale shape: the model is a (classes × vocab) count table built by
  * one explode + hash aggregate with map-side partials; scoring
  * fans each test term out only |classes| ways (a bounded broadcast
  * spine, never a second corpus pass); class totals ride as a
  * broadcastable side; V is a 1-row broadcast. The per-doc argmax
  * window partitions by doc — millions of independent partitions. */
object NaiveBayes {

  /** Score every `test` doc against classes learned from `train`;
    * returns (doc_id, predicted, score) — one row per doc. */
  def predict(train: DataFrame, test: DataFrame, classCol: String = "lang",
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val trainTerms = train.select(col(classCol).as("c"),
        explode(Text.tokens(lower(col(textCol)))).as("term"))
    val ctc = trainTerms.groupBy(col("c"), col("term")).agg(count(lit(1)).as("n"))
    val ctot = trainTerms.groupBy(col("c")).agg(count(lit(1)).as("tot"))
    val vocab = trainTerms.agg(count_distinct(col("term")).as("v"))
    val nTrain = train.agg(count(lit(1)).as("n_train"))
    val priors = train.groupBy(col(classCol).as("c")).agg(count(lit(1)).as("nc"))
      .crossJoin(broadcast(nTrain))
      .select(col("c"),
        round(log(col("nc").cast("double") / col("n_train").cast("double")), 6)
          .cast(DecimalType(18, 6)).as("logprior"))
    val testTerms = test
      .select(col(idCol).as("doc_id"), explode(Text.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val scored = testTerms
      .crossJoin(broadcast(priors.join(ctot, Seq("c"))))
      .join(ctc, Seq("c", "term"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("c"), col("logprior"),
        round(col("tf") * log((coalesce(col("n"), lit(0L)) + 1).cast("double") /
          (col("tot") + col("v")).cast("double")), 6)
          .cast(DecimalType(18, 6)).as("contrib"))
      .groupBy(col("doc_id"), col("c"), col("logprior"))
      .agg(sum(col("contrib")).as("loglik"))
      .select(col("doc_id"), col("c"),
        (col("logprior") + col("loglik")).as("score"))
    val byScore = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("c").desc)
    scored.withColumn("__rn", row_number().over(byScore))
      .where(col("__rn") === 1)
      .select(col("doc_id"), col("c").as("predicted"),
        col("score").cast("double").as("score"))
  }

  /** Hash-fold evaluation: train on `id % folds != 0`, predict the
    * held-out fold, return the confusion matrix (actual × predicted
    * counts) — the bounded, engine-exact summary of the whole
    * train→predict chain. */
  def confusion(docs: DataFrame, folds: Int = 5, classCol: String = "lang",
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(folds >= 2, s"confusion needs folds >= 2: $folds")
    val train = docs.where(col(idCol) % folds =!= 0)
    val test = docs.where(col(idCol) % folds === 0)
    predict(train, test, classCol, idCol, textCol)
      .join(test.select(col(idCol).as("doc_id"), col(classCol).as("actual")),
        Seq("doc_id"))
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("actual"), col("predicted"))
  }

  /** Per-class precision / recall / F1 from the held-out confusion
    * matrix — the standard evaluation sheet over [[confusion]]'s
    * engine-exact counts. Classes are anchored on the ACTUAL label
    * set (a class predicted but never present in the fold has no
    * recall and is out of scope by construction). Precision is null
    * when the class is never predicted (0/0 has no value, and 0 would
    * fake perfect badness); F1 is null when both ratios are 0 (their
    * harmonic mean is 0/0). Each ratio is ONE IEEE division over
    * exact longs, F1 one fixed-order chain over the UNROUNDED ratios,
    * all rounded to 6 for the certified output — the whole sheet
    * stays a few-rows aggregate no matter the corpus size. */
  /** One-row evaluation summary: accuracy and Cohen's kappa — the
    * chance-corrected agreement (a majority-class predictor scores
    * high accuracy but kappa ≈ 0, which is why the sheet needs both).
    * pe (chance agreement) is Σ act_c·pred_c / N² over the margins,
    * DECIMAL-widened before the products; both statistics are single
    * rounded IEEE chains over exact counts; kappa is null when pe = 1
    * (a degenerate single-class fold has no chance correction). */
  def summary(docs: DataFrame, folds: Int = 5, classCol: String = "lang",
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cm = confusion(docs, folds, classCol, idCol, textCol)
    val tot = cm.agg(
      sum(when(col("actual") === col("predicted"), col("n")).otherwise(0L))
        .as("__diag"),
      sum(col("n")).as("__n"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pen = cm.groupBy(col("actual")).agg(sum(col("n")).as("__a"))
      .join(cm.groupBy(col("predicted")).agg(sum(col("n")).as("__p")),
        col("actual") === col("predicted"))
      .agg(coalesce(sum((col("__a").cast(dec) * col("__p")).cast(dec)), lit(0L))
        .as("__pen"))
    val po = col("__diag").cast("double") / col("__n").cast("double")
    val pe = col("__pen").cast("double") /
      (col("__n").cast("double") * col("__n").cast("double"))
    tot.crossJoin(broadcast(pen))
      .select(col("__n").cast("long").as("n_test"),
        round(po, 6).as("accuracy"),
        when(pe =!= 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  def metrics(docs: DataFrame, folds: Int = 5, classCol: String = "lang",
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cm = confusion(docs, folds, classCol, idCol, textCol)
    val act = cm.groupBy(col("actual").as("clazz")).agg(sum(col("n")).as("actual_n"))
    val pred = cm.groupBy(col("predicted").as("__p")).agg(sum(col("n")).as("__pn"))
    val tp = cm.where(col("actual") === col("predicted"))
      .select(col("actual").as("__t"), col("n").as("__tp"))
    val p = col("tp").cast("double") / col("predicted_n").cast("double")
    val r = col("tp").cast("double") / col("actual_n").cast("double")
    act
      .join(pred, col("clazz") === col("__p"), "left")
      .join(tp, col("clazz") === col("__t"), "left")
      .select(col("clazz"),
        coalesce(col("__tp"), lit(0L)).as("tp"),
        col("actual_n"),
        coalesce(col("__pn"), lit(0L)).as("predicted_n"))
      .withColumn("prec", when(col("predicted_n") > 0, round(p, 6)))
      .withColumn("rec", round(r, 6))
      .withColumn("f1",
        when(col("predicted_n") > 0 && (p + r) > lit(0.0),
          round((lit(2.0) * p * r) / (p + r), 6)))
      .orderBy(col("clazz"))
  }
}
