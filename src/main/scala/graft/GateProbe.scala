package graft

/** Prints every size-gate decision for a corpus dir WITHOUT running
  * the entries — the scale-rehearsal evidence that the r20 gates
  * (withSmallShuffle's DOP-8/AQE-off pin, the streams' state
  * partition count) release as the corpus grows:
  *
  *   sbt "runMain graft.GateProbe [sfDir...]"
  *
  * For each dir: the per-entry-family driving-table bytes vs the pin
  * threshold, and streamPartitionsFor over the staged replay dirs
  * (staged here if missing, exactly as the entries would).
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1")
    val families = Seq(
      "session sketches (kmv/cms/quantile)" -> Seq("events"),
      "doc kernels (decontaminate/perplexity/source_overlap)" -> Seq("documents"),
      "ann pq/ivfpq family" -> Seq("embeddings"))
    for (dir <- dirs) {
      println(s"== $dir")
      for ((fam, tables) <- families) {
        val b = Queries.tableBytes(dir, tables)
        val pinned = b < Queries.SmallShuffleMaxBytes
        println(f"  [small-shuffle] $fam%-55s ${b / 1048576.0}%8.1f MiB -> " +
          (if (pinned) "PINNED (DOP 8, AQE off)" else "released (session DOP + AQE)"))
      }
    }
    println("(stream partition gates print per staged replay dir when the " +
      "entries run — see [stream-gate] / [stream-etl] stderr lines)")
  }
}
