package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One flattened node of a geth callTracer frame tree
  * (reference: types/geth_trace.rs:8-44 CallFrame/InnerCallFrame).
  */
case class FlatFrame(
    from_address: String,
    to_address: String,
    input: String,
    output: String,
    value: String,
    gas: Option[Long],
    gas_used: Option[Long],
    call_type: String,
    error: String,
    subtraces: Int,
    trace_address: Seq[Int],
)

/** F1/F2: recursive call-frame flatten. Spark has no recursive
  * StructType, so the frame tree stays a raw JSON string column and is
  * flattened by a recursive Scala function inside `flatMap` — a
  * per-row linear operation that runs inside the scan stage (no
  * shuffle, arbitrarily deep trees).
  *
  * Semantics (reference: geth_trace.rs:46-84): DFS, parent emitted
  * BEFORE children, `trace_address` = path of child indices (root =
  * []), `subtraces` = direct-child count.
  */
object Flatten {

  private val mapper = new ObjectMapper()

  private def strOrNull(n: JsonNode, field: String): String = {
    val v = n.get(field)
    if (v == null || v.isNull) null else v.asText()
  }

  private def hexLong(n: JsonNode, field: String): Option[Long] = {
    val s = strOrNull(n, field)
    if (s == null) None
    else if (s.startsWith("0x") || s.startsWith("0X"))
      try Some(java.lang.Long.parseLong(s.substring(2), 16)) catch { case _: NumberFormatException => None }
    else s.toLongOption
  }

  /** Flatten one frame tree (parsed JSON). */
  def flattenNode(node: JsonNode, path: Vector[Int]): Seq[FlatFrame] = {
    val calls = node.get("calls")
    val nKids = if (calls == null || calls.isNull) 0 else calls.size()
    val self = FlatFrame(
      from_address = strOrNull(node, "from"),
      to_address = strOrNull(node, "to"),
      input = strOrNull(node, "input"),
      output = strOrNull(node, "output"),
      value = strOrNull(node, "value"),
      gas = hexLong(node, "gas"),
      gas_used = hexLong(node, "gasUsed"),
      call_type = Option(strOrNull(node, "type")).map(_.toLowerCase).orNull,
      error = strOrNull(node, "error"),
      subtraces = nKids,
      trace_address = path,
    )
    self +: (0 until nKids).flatMap(i => flattenNode(calls.get(i), path :+ i))
  }

  /** Flatten a JSON frame-tree string; malformed JSON yields no rows
    * (quarantine-not-crash, SURVEY §7.1 delta 3).
    */
  def flattenJson(json: String): Seq[FlatFrame] =
    if (json == null) Seq.empty
    else try flattenNode(mapper.readTree(json), Vector.empty)
    catch { case _: Exception => Seq.empty }

  /** F1 over a DataFrame: one row per call-tree node, keyed by the
    * carried-through key columns.
    */
  def flattenFrames(df: DataFrame, keyCol: String, jsonCol: String): Dataset[(Long, FlatFrame)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(jsonCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (k, json) => flattenJson(json).map(k -> _) }
  }

  /** F2: per-block fan-out of (tx hash list, per-tx frame trees) with
    * the reference's 1-BASED transaction_index quirk
    * (reference: consumer/ws/mod.rs:86-103, index at :95).
    */
  def fanOutBlock(df: DataFrame, blockCol: String, hashesCol: String,
      framesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val exploded = df.select(col(blockCol).cast("long").as("block_number"),
        posexplode(arrays_zip(col(hashesCol), col(framesCol))))
      .select(col("block_number"),
        (col("pos") + 1).as("transaction_index"), // 1-based (quirk)
        col("col").getField(hashesCol).as("transaction_hash"),
        col("col").getField(framesCol).cast("string").as("frame_json"))
    val flat = exploded
      .select("block_number", "transaction_index", "transaction_hash", "frame_json")
      .as[(Long, Int, String, String)]
      .flatMap { case (bn, idx, hash, json) =>
        flattenJson(json).map(f => (bn, idx, hash, f))
      }
      .toDF("block_number", "transaction_index", "transaction_hash", "frame")
    flat.select(col("block_number"), col("transaction_index"),
      col("transaction_hash"), col("frame.*"))
  }
}
