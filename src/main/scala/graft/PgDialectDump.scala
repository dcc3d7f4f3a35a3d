package graft

import graft.sinks.{JdbcUpsert, Tables, UpsertSpec}

/** Dump the EXACT Postgres-dialect upsert statements the sink renders
  * for the three production tables, as JSON lines — consumed by
  * tools/check_pg_dialect.py, which executes them against DuckDB's
  * Postgres-compatible `INSERT .. ON CONFLICT` implementation (no
  * Postgres server or pgjdbc exists in this offline sandbox; DuckDB is
  * the closest engine that actually parses and executes the dialect).
  *
  *   runMain graft.PgDialectDump [outPath]
  */
object PgDialectDump {
  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "/tmp/pg_dialect.json"
    def j(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def line(spec: UpsertSpec): String = {
      val st = JdbcUpsert.upsertStatement(spec, "postgres")
      s"""{"table":${j(spec.table)},"sql":${j(st.sql)},""" +
        s""""param_cols":[${st.paramCols.map(j).mkString(",")}],""" +
        s""""conflict_keys":[${spec.conflictKeys.map(j).mkString(",")}],""" +
        s""""policy":${j(spec.policy.toString)}}"""
    }
    val lines = Seq(Tables.transactions, Tables.contracts, Tables.blocks).map(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      lines.mkString("", "\n", "\n"))
    lines.foreach(println)
  }
}
