package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions._

/** Session-extension plugin: `--conf spark.sql.extensions=graft.GraftExtensions`
  * injects every graft Expression into the function registry at session
  * build time, so pure-SQL clients (spark-sql, JDBC/Thrift, notebooks
  * with no Scala cell) can call `graft_dot` / `graft_shingles` /
  * `graft_jaccard` / `graft_rolling_hash` like built-ins.
  *
  * This is the deployment-grade route (SURVEY.md §2.11): unlike
  * [[graft.expressions.GraftFunctions.register]] — a per-session temp
  * registration that a `newSession()` or a restarted Thrift session
  * silently loses — extension-injected functions are part of the
  * session blueprint and survive `newSession()`. Both routes build the
  * exact same Expression trees, so plans and results are identical.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  /** One (identifier, doc, builder) triple per custom Expression; the
    * builders mirror [[GraftFunctions.register]] exactly. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier(GraftFunctions.DotName),
        info(classOf[DotProduct], GraftFunctions.DotName),
        (e: Seq[Expression]) => DotProduct(e(0), e(1))),
      (FunctionIdentifier(GraftFunctions.Dist2Name),
        info(classOf[Dist2], GraftFunctions.Dist2Name),
        (e: Seq[Expression]) => Dist2(e(0), e(1))),
      (FunctionIdentifier(GraftFunctions.ShinglesName),
        info(classOf[DistinctShingles], GraftFunctions.ShinglesName),
        (e: Seq[Expression]) => DistinctShingles(e(0),
          GraftFunctions.literalArg(e, 1, GraftFunctions.ShinglesName, "n")
            .asInstanceOf[Int])),
      (FunctionIdentifier(GraftFunctions.JaccardName),
        info(classOf[JaccardSim], GraftFunctions.JaccardName),
        (e: Seq[Expression]) => JaccardSim(e(0), e(1))),
      (FunctionIdentifier(GraftFunctions.RollingHashName),
        info(classOf[RollingHash], GraftFunctions.RollingHashName),
        (e: Seq[Expression]) => RollingHash(e(0))),
      (FunctionIdentifier(GraftFunctions.BloomAggName),
        info(classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
          GraftFunctions.BloomAggName),
        (e: Seq[Expression]) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            e(0), e(1), e(2))),
      (FunctionIdentifier(GraftFunctions.BloomContainsName),
        info(classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
          GraftFunctions.BloomContainsName),
        (e: Seq[Expression]) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(e(0), e(1))),
      (FunctionIdentifier(GraftFunctions.UnicodeNormalizeName),
        info(classOf[UnicodeNormalize], GraftFunctions.UnicodeNormalizeName),
        (e: Seq[Expression]) => UnicodeNormalize(e(0),
          GraftFunctions.literalArg(e, 1,
            GraftFunctions.UnicodeNormalizeName, "form").toString)),
      (FunctionIdentifier(GraftFunctions.JaroWinklerName),
        info(classOf[JaroWinklerSim], GraftFunctions.JaroWinklerName),
        (e: Seq[Expression]) => JaroWinklerSim(e(0), e(1))))
}
