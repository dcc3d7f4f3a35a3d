package graft.functions

import org.apache.spark.sql.{Column, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Keccak-256 of the UTF-8 bytes of the input string, as lowercase hex.
  * Native Catalyst expression (participates in whole-stage codegen via a
  * static call — no UDF serialization overhead).
  */
case class Keccak256Hex(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.GraftStringUnaryInput {
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
  * (reference: ethers `to_checksum`, etl_result.rs:166-171).
  * Malformed addresses (not 40 hex chars after stripping 0x) yield null.
  */
case class ChecksumAddress(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.GraftStringUnaryInput {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "checksum_address"

  override def nullSafeEval(input: Any): Any = {
    val out = Keccak.toChecksumAddress(input.asInstanceOf[UTF8String].toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      String graftChecksum = graft.functions.Keccak.toChecksumAddress($c.toString());
      if (graftChecksum == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(graftChecksum);
      }""")

  override protected def withNewChildInternal(newChild: Expression): ChecksumAddress =
    copy(child = newChild)
}

/** 64-bit SimHash of whitespace-separated tokens of the input string.
  * Each token is hashed (FNV-1a 64); bit-majority over token hashes
  * forms the signature. Near-duplicate texts differ in few bits.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.GraftStringUnaryInput {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash64($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Column-API entry points for graft's custom scalar functions. */
object GraftFunctions {
  private def col(e: Expression): Column = GraftShim.column(e)
  private def expr(c: Column): Expression = GraftShim.expression(c)

  def keccak256_hex(c: Column): Column = col(Keccak256Hex(expr(c)))
  def checksum_address(c: Column): Column = col(ChecksumAddress(expr(c)))
  def simhash64(c: Column): Column = col(SimHash64(expr(c)))

  private def unary(name: String, f: Expression => Expression)(es: Seq[Expression]): Expression = {
    if (es.length != 1)
      throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${es.length}")
    f(es.head)
  }

  private def binary(name: String, f: (Expression, Expression) => Expression)(
      es: Seq[Expression]): Expression = {
    if (es.length != 2)
      throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments, got ${es.length}")
    f(es.head, es(1))
  }

  /** Every SQL-callable function as (name, builder) — the single list
    * behind both [[register]] (per-session temp functions, the test /
    * notebook path) and [[graft.GraftExtensions]] (cluster-wide
    * injection via `spark.sql.extensions`, the deploy path).
    */
  def sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "keccak256_hex" -> unary("keccak256_hex", Keccak256Hex) _,
    "checksum_address" -> unary("checksum_address", ChecksumAddress) _,
    "simhash64" -> unary("simhash64", SimHash64) _,
    "flatten_calls" -> unary("flatten_calls", FlattenCalls.apply) _,
    "quantized_dot" -> binary("quantized_dot", QuantizedDot.apply) _,
    "dot_long" -> binary("dot_long", DotLong.apply) _,
    "cosine_sim" -> binary("cosine_sim", CosineSim.apply) _,
    "arith_minhash_sig" -> unary("arith_minhash_sig", ArithMinhashSig(_, 8)) _,
    "fnv64" -> unary("fnv64", Fnv64) _)

  /** Register SQL-callable names on a session (idempotent — names
    * already present are left alone, so repeated calls across a bench
    * run don't spam `SimpleFunctionRegistry ... replaced` WARNs). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlFunctions.foreach { case (name, builder) =>
      val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(ident))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
