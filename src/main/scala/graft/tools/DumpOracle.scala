package graft.tools

import graft.SparkEntry
import java.nio.file.{Files, Paths}

/** Writes SparkEntry.oracleSql as oracle_sql.json to args(0) WITHOUT
  * running any query — regenerates the driver-compare SQL dump when a
  * Verify output directory is intact but its json is missing or stale
  * (e.g. a filtered Verify overwrote it with a subset). Same escaping
  * as [[graft.Verify]]. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(args(0)), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracle entries to ${args(0)}")
  }
}
