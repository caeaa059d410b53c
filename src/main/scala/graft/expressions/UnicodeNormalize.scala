package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen
  * Expression — the canonicalization step web-text pipelines need
  * BEFORE fingerprinting/dedup: the same visible text arrives both
  * precomposed (é = U+00E9) and decomposed (e + U+0301), and without
  * normalization the two hash as different documents, silently
  * defeating exact dedup and winnowing (reference scope: text
  * cleaning, SURVEY §2.13; [[graft.functions.Text.normalized]] folds
  * case/whitespace but not codepoints).
  *
  * Why an Expression and not a UDF (the §2.11 ladder): the call sits
  * inside whole-stage codegen (no per-row encoder round-trip), and
  * the fast path — `Normalizer.isNormalized`, true for virtually all
  * real text — returns the INPUT UTF8String with zero allocation.
  * DuckDB's `nfc_normalize` implements the same Unicode algorithm,
  * which is what makes the NFC form oracle-certifiable.
  */
case class UnicodeNormalize(child: Expression, formName: String)
  extends UnaryExpression {

  @transient private lazy val form: Normalizer.Form = Normalizer.Form.valueOf(formName)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if UnicodeNormalize.Forms(formName) =>
      TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got $formName")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def prettyName: String = "graft_unicode_normalize"
  override def dataType: DataType = child.dataType

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.norm(input.asInstanceOf[UTF8String], form)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", form, classOf[Normalizer.Form].getName)
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnicodeNormalize.norm($c, $formRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static entry for both eval and generated code. Fast path: already-
    * normalized input (all of ASCII, virtually all real text) returns
    * the original UTF8String without allocating. */
  def norm(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
