package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of every query for the
  * scale audit (pushdown, broadcast, partial agg, codegen spans). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outPath = if (args.length > 1) args(1) else "target/explains.txt"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb.append(s"\n=================== $name ===================\n")
      try sb.append(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => sb.append(s"FAILED: ${e.getMessage}\n") }
    }
    Files.createDirectories(Paths.get(outPath).getParent)
    Files.writeString(Paths.get(outPath), sb.toString)
    println(s"wrote $outPath")
    spark.stop()
  }
}
