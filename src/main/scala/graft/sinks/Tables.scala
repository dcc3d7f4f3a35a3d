package graft.sinks

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-table upsert presets mirroring the reference's conflict
  * policies exactly (reference: etl_result.rs):
  *   - transactions: ON CONFLICT (chain_id, transaction_hash)
  *     DO NOTHING (:153-159)
  *   - contracts: ON CONFLICT (chain_id, address, function_signatures)
  *     DO NOTHING (:213-216)
  *   - blocks: ON CONFLICT (chain_id, number) DO UPDATE full
  *     overwrite (:267-281)
  */
object Tables {

  val transactionColumns: Seq[String] = Seq(
    "chain_id", "from_address", "to_address", "closest_address",
    "function_signature", "transaction_hash", "transaction_index",
    "block_number", "block_timestamp", "block_hash", "value", "input",
    "gas_used_total", "gas_used_first_degree", "gas_used_second_degree",
    "ec_recover_count", "ec_add_count", "ec_mul_count", "ec_pairing_count",
    "ec_pairing_input_sizes", "ec_recover_addresses", "error")

  val contractColumns: Seq[String] = Seq(
    "chain_id", "address", "function_signatures", "degree",
    "ec_recover_count", "ec_add_count", "ec_mul_count", "ec_pairing_count",
    "ec_pairing_input_sizes", "call")

  val blockColumns: Seq[String] = Seq(
    "chain_id", "number", "timestamp", "hash", "parent_hash",
    "transaction_count", "nonce", "miner", "difficulty", "total_difficulty",
    "size", "gas_limit", "gas_used", "base_fee_per_gas")

  val transactions: UpsertSpec = UpsertSpec("transactions",
    transactionColumns, Seq("chain_id", "transaction_hash"), DoNothing)

  val contracts: UpsertSpec = UpsertSpec("contracts",
    contractColumns, Seq("chain_id", "address", "function_signatures"), DoNothing)

  val blocks: UpsertSpec = UpsertSpec("blocks",
    blockColumns, Seq("chain_id", "number"), Overwrite)

  /** P9 at its real call site: the reference renders every address
    * column EIP-55-checksummed at write time (etl_result.rs:166-171,
    * 196-200, 221, 238-242, 293); the engine keeps lowercase
    * canonical form internally and checksums on the way out.
    */
  def renderChecksummed(df: DataFrame, addrCols: Seq[String],
      addrArrayCols: Seq[String] = Seq.empty): DataFrame = {
    val withScalars = addrCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, GraftFunctions.checksum_address(col(c)))
    }
    addrArrayCols.foldLeft(withScalars) { (d, c) =>
      d.withColumn(c, transform(col(c), a => GraftFunctions.checksum_address(a)))
    }
  }
}
