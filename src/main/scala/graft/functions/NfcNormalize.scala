package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization as a native Catalyst expression — the
  * text-cleanup step every web-scraped corpus needs before hashing or
  * deduplication (the same logical string arrives from different sources
  * as precomposed é vs e+U+0301; byte-level dedup keys must not split on
  * that). Spark has no normalization builtin, and a Scala UDF here would
  * break whole-stage codegen on the hottest map stage in a curation
  * pipeline, so this is the (b)-preference custom Expression: stays
  * inside codegen, one virtual call per row to the JDK's normalizer.
  *
  * Cross-engine contract: java.text.Normalizer NFC and DuckDB's
  * nfc_normalize both implement Unicode Standard Annex #15 canonical
  * composition, so oracle SQL replays this byte-for-byte (gate row d37).
  *
  * The ASCII fast path matters at scale: NFC is the identity on pure
  * ASCII, and `Normalizer.isNormalized` is a cheap scan with an ASCII
  * early-exit — a mostly-English 100 TB corpus pays ~one branch per
  * row, with the quadratic-ish composition machinery touched only by
  * rows that actually carry combining marks.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.nfcJava(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.nfcJava($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpr = copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code (the
    * companion's static forwarder makes it reachable from Janino). */
  def nfcJava(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** nfc_normalize(c) over a STRING column. */
  def nfc_normalize(c: Column): Column =
    bridge.column(NfcNormalizeExpr(bridge.expression(c)))
}
