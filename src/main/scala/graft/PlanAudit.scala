package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        val bcast = "BroadcastExchange".r.findAllIn(plan).size
        val cartesian = plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        val flags = (if (cartesian) " CARTESIAN" else "") + (if (smj > 0) s" SMJ=$smj" else "")
        println(f"AUDIT $name%-28s shuffles=$exchanges%-3d bcast=$bcast%-3d$flags")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
