package graft.operators

import graft.model._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Pure helpers mirroring the reference's per-trace scalar logic.
  * All inputs are 0x-prefixed lowercase hex strings.
  */
object TraceOps {

  /** Decoded byte length of a 0x-hex string. */
  def hexByteLen(hex: String): Int =
    if (hex == null) 0
    else if (hex.startsWith("0x") || hex.startsWith("0X")) (hex.length - 2) / 2
    else hex.length / 2

  /** Function selector: first 4 bytes of calldata iff the calldata is
    * STRICTLY longer than 4 bytes, else the zero selector
    * (reference: trace_tree.rs:44-53 `construct_signature` — a
    * 4-byte-exact input yields zero; quirk preserved).
    */
  def selector(input: String): String =
    if (input == null || hexByteLen(input) <= 4) Addresses.ZeroSelector
    else "0x" + input.substring(2, 10)

  /** Selector masked to zero when the callee is a first-degree filter
    * precompile (reference: trace_tree.rs:55-65).
    */
  def selectorWithTo(input: String, to: String): String =
    if (to != null && Addresses.FirstDegreeFilter.contains(to)) Addresses.ZeroSelector
    else selector(input)

  /** ecRecover output → recovered address: outputs shorter than 32
    * bytes are invalid → zero address; else bytes [12, 32) of the
    * output (reference: trace_tree.rs:287-301).
    */
  def recoveredAddress(output: String): String =
    if (hexByteLen(output) < 32) Addresses.Zero
    else "0x" + output.substring(2 + 24, 2 + 64)
}

/** Aggregation buffer: the reference's five incremental aggregates
  * (reference: trace_tree.rs:14-26). Maps are keyed by lowercase
  * address; counts merge by summation so map-side partial aggregation
  * is exact.
  */
case class TreeBuf(
    chainId: Option[Long], //  group key, captured on first reduce
    txHash: Option[String],
    callTree: Map[String, Map[String, Long]], //   to -> from -> count
    gasTree: Map[String, Map[String, Long]], //  from -> to   -> gas
    sigTree: Map[String, Seq[String]], //          to -> selectors (distinct)
    pairSizes: Map[String, Seq[Int]], //         from -> input sizes (multiset)
    recoverAddrs: Seq[String], //                       distinct
    root: Option[RootInfo],
)

object TreeBuf {
  val empty: TreeBuf =
    TreeBuf(None, None, Map.empty, Map.empty, Map.empty, Map.empty, Seq.empty, None)

  private[operators] def mergeCounts(
      a: Map[String, Map[String, Long]],
      b: Map[String, Map[String, Long]]): Map[String, Map[String, Long]] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else b.foldLeft(a) { case (acc, (k, inner)) =>
      val merged = acc.get(k) match {
        case None => inner
        case Some(cur) => inner.foldLeft(cur) { case (m, (k2, v)) =>
          m.updated(k2, m.getOrElse(k2, 0L) + v)
        }
      }
      acc.updated(k, merged)
    }
}

/** Fused per-transaction commit: one pass over a transaction's traces
  * maintains all five aggregates (reference: trace_tree.rs:247-303
  * `add_trace`), and `finish` derives the transaction + contract rows
  * (reference: trace_tree.rs:72-245 `commit`).
  *
  * Spark shape: ONE shuffle on (chain_id, transaction_hash) with
  * map-side partial aggregation — the degree-graph traversal (J2/J3),
  * degree union (J4), enrichment (J5) and closest-address pick (J6)
  * all happen inside `finish` on the per-tx buffer, so no self-joins
  * reach the physical plan. At 100 TB this is the minimum-exchange
  * formulation: shuffle volume is the partially-aggregated tree
  * buffers, not the raw traces.
  *
  * Deliberate deltas from the reference (documented in SURVEY §7.1):
  * grouping is by key, not stream order, so late/reordered traces
  * cannot be mis-attributed to a neighboring transaction; array
  * outputs are sorted for deterministic comparison.
  */
class TraceTreeAggregator extends Aggregator[TraceRow, TreeBuf, TxCommit] {
  import TraceOps._

  override def zero: TreeBuf = TreeBuf.empty

  override def reduce(buf0: TreeBuf, t: TraceRow): TreeBuf = {
    val buf = if (buf0.chainId.isEmpty)
      buf0.copy(chainId = Some(t.chain_id), txHash = Option(t.transaction_hash))
    else buf0
    val withRoot = if (t.is_root && buf.root.isEmpty) {
      buf.copy(root = Some(RootInfo(
        t.transaction_index, t.from_address, t.to_address, t.value,
        t.input, t.gas_used, t.block_number, t.block_timestamp,
        t.block_hash, t.error)))
    } else buf
    (t.from_address, t.to_address) match {
      case (Some(from), Some(to)) =>
        // reference: trace_tree.rs:249-257 — input=None still records
        // the zero selector via unwrap_or_default
        val sig = t.input.map(selectorWithTo(_, to))
          .getOrElse(Addresses.ZeroSelector)
        val sigs = withRoot.sigTree.getOrElse(to, Seq.empty)
        val sigTree =
          if (sigs.contains(sig)) withRoot.sigTree
          else withRoot.sigTree.updated(to, sigs :+ sig)
        val callTree = withRoot.callTree.updatedWith(to) { m =>
          val inner = m.getOrElse(Map.empty)
          Some(inner.updated(from, inner.getOrElse(from, 0L) + 1L))
        }
        val gas = t.gas_used.getOrElse(0L)
        val gasTree = withRoot.gasTree.updatedWith(from) { m =>
          val inner = m.getOrElse(Map.empty)
          Some(inner.updated(to, inner.getOrElse(to, 0L) + gas))
        }
        val pairSizes =
          if (to == Addresses.EcPairing)
            withRoot.pairSizes.updatedWith(from) { s =>
              Some(s.getOrElse(Seq.empty) :+ t.input.map(hexByteLen).getOrElse(0))
            }
          else withRoot.pairSizes
        val recoverAddrs =
          if (to == Addresses.EcRecover && t.output.nonEmpty) {
            val a = recoveredAddress(t.output.get)
            if (withRoot.recoverAddrs.contains(a)) withRoot.recoverAddrs
            else withRoot.recoverAddrs :+ a
          } else withRoot.recoverAddrs
        withRoot.copy(callTree = callTree, gasTree = gasTree,
          sigTree = sigTree, pairSizes = pairSizes, recoverAddrs = recoverAddrs)
      case _ => withRoot
    }
  }

  override def merge(a: TreeBuf, b: TreeBuf): TreeBuf = TreeBuf(
    chainId = a.chainId.orElse(b.chainId),
    txHash = a.txHash.orElse(b.txHash),
    callTree = TreeBuf.mergeCounts(a.callTree, b.callTree),
    gasTree = TreeBuf.mergeCounts(a.gasTree, b.gasTree),
    sigTree = b.sigTree.foldLeft(a.sigTree) { case (acc, (k, v)) =>
      acc.updated(k, (acc.getOrElse(k, Seq.empty) ++ v).distinct)
    },
    pairSizes = b.pairSizes.foldLeft(a.pairSizes) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, Seq.empty) ++ v)
    },
    recoverAddrs = (a.recoverAddrs ++ b.recoverAddrs).distinct,
    root = a.root.orElse(b.root),
  )

  override def finish(buf: TreeBuf): TxCommit =
    TraceTreeAggregator.commit(buf, buf.chainId.getOrElse(-1L), buf.txHash.orNull)

  override def bufferEncoder: Encoder[TreeBuf] = Encoders.product[TreeBuf]
  override def outputEncoder: Encoder[TxCommit] = Encoders.product[TxCommit]
}

object TraceTreeAggregator {
  import TraceOps._

  /** The reference's `commit` (trace_tree.rs:72-245) over a completed
    * per-tx buffer. Returns no transaction when the commit filter
    * fails (no call to ecRecover/ecPairing) or the root trace is
    * missing any of hash/index/from/to.
    */
  def commit(buf: TreeBuf, chainId: Long, txHash: String): TxCommit = {
    val commitFilter = buf.callTree.contains(Addresses.EcRecover) ||
      buf.callTree.contains(Addresses.EcPairing)
    val rootOk = buf.root.exists(r =>
      r.transaction_index.isDefined && r.from_address.isDefined && r.to_address.isDefined)
    if (!commitFilter || !rootOk || txHash == null) return TxCommit(None, Seq.empty)
    val root = buf.root.get

    // J2: first-degree callers -> set of filter precompiles they called
    // (reference: trace_tree.rs:91-100)
    val firstDegree: Map[String, Seq[String]] =
      Addresses.FirstDegreeFilter.flatMap { p =>
        buf.callTree.getOrElse(p, Map.empty).keys.map(_ -> p)
      }.groupBy(_._1).map { case (a, ps) => a -> ps.map(_._2).distinct }

    // J3: second-degree callers -> set of first-degree addrs they
    // called, minus the EOA (reference: trace_tree.rs:102-112)
    val secondDegree: Map[String, Seq[String]] =
      firstDegree.keys.flatMap { fd =>
        buf.callTree.getOrElse(fd, Map.empty).keys.map(_ -> fd)
      }.toSeq.groupBy(_._1).map { case (a, fds) => a -> fds.map(_._2).distinct } -
        root.from_address.get

    def precompileCount(p: String, a: String): Long =
      buf.callTree.getOrElse(p, Map.empty).getOrElse(a, 0L)

    // J4 degree-tagged union + J5 enrichment
    // (reference: trace_tree.rs:115-163); an address in both degrees
    // yields two rows — quirk preserved
    val contracts = (firstDegree.toSeq.map(t => (t, 0)) ++
      secondDegree.toSeq.map(t => (t, 1))).map { case ((a, call), degree) =>
      ContractOut(
        chain_id = chainId,
        address = a,
        function_signatures = buf.sigTree.getOrElse(a, Seq.empty).sorted,
        degree = degree,
        ec_recover_count = precompileCount(Addresses.EcRecover, a),
        ec_add_count = precompileCount(Addresses.EcAdd, a),
        ec_mul_count = precompileCount(Addresses.EcMul, a),
        ec_pairing_count = precompileCount(Addresses.EcPairing, a),
        ec_pairing_input_sizes = buf.pairSizes.getOrElse(a, Seq.empty).sorted,
        call = call.sorted,
      )
    }.sortBy(c => (c.degree, c.address))

    // A9: per-degree gas = ALL outgoing gas of the degree's callers,
    // not only gas toward precompiles (reference: trace_tree.rs:165-175)
    // iterator, not Set.flatMap — a set would collapse equal gas values
    def degreeGas(addrs: Iterable[String]): Long =
      addrs.iterator.flatMap(a => buf.gasTree.getOrElse(a, Map.empty).valuesIterator).sum

    val tx = TransactionOut(
      chain_id = chainId,
      transaction_hash = txHash,
      from_address = root.from_address.get,
      to_address = root.to_address.get,
      // J6 (reference: trace_tree.rs:180-187)
      closest_address =
        (if (secondDegree.nonEmpty) secondDegree.keys else firstDegree.keys).toSeq.sorted,
      // tx-level selector is NOT precompile-masked
      // (reference: trace_tree.rs:189-194 uses construct_signature)
      function_signature = root.input.map(selector).getOrElse(Addresses.ZeroSelector),
      transaction_index = root.transaction_index.get,
      block_number = root.block_number,
      block_timestamp = root.block_timestamp,
      block_hash = root.block_hash,
      value = root.value.getOrElse("0"),
      input = root.input.getOrElse("0x"),
      gas_used_total = root.gas_used.getOrElse(0L),
      gas_used_first_degree = degreeGas(firstDegree.keys),
      gas_used_second_degree = degreeGas(secondDegree.keys),
      ec_recover_count = buf.callTree.getOrElse(Addresses.EcRecover, Map.empty).values.sum,
      ec_add_count = buf.callTree.getOrElse(Addresses.EcAdd, Map.empty).values.sum,
      ec_mul_count = buf.callTree.getOrElse(Addresses.EcMul, Map.empty).values.sum,
      ec_pairing_count = buf.callTree.getOrElse(Addresses.EcPairing, Map.empty).values.sum,
      ec_pairing_input_sizes = buf.pairSizes.values.flatten.toSeq.sorted,
      ec_recover_addresses = buf.recoverAddrs.sorted,
      error = root.error,
    )
    TxCommit(Some(tx), contracts)
  }
}
