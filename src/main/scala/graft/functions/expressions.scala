package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Keccak-256 of the UTF-8 bytes of the input string, as lowercase hex.
  * Native Catalyst expression (participates in whole-stage codegen via a
  * static call — no UDF serialization overhead).
  */
case class Keccak256Hex(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "keccak256_hex"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Keccak.hash256Hex(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Keccak.hash256Hex($c.getBytes()))")

  override protected def withNewChildInternal(newChild: Expression): Keccak256Hex =
    copy(child = newChild)
}

/** EIP-55 mixed-case checksum rendering of a hex address
  * (reference: ethers `to_checksum`, etl_result.rs:166-171). */
case class ChecksumAddress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "checksum_address"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Keccak.toChecksumAddress(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Keccak.toChecksumAddress($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): ChecksumAddress =
    copy(child = newChild)
}

/** Column-API entry points for graft's custom scalar functions. */
object GraftFunctions {
  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def expr(c: Column): Expression = ExpressionUtils.expression(c)

  def keccak256_hex(c: Column): Column = col(Keccak256Hex(expr(c)))
  def checksum_address(c: Column): Column = col(ChecksumAddress(expr(c)))

  /** Register SQL-callable names on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "keccak256_hex", es => Keccak256Hex(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "checksum_address", es => ChecksumAddress(es.head), "built-in")
  }
}
