package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named SparkEntry queries
  * (all of them with no args) — the `.explain("formatted")` audit loop.
  * Usage: sbt "runMain graft.PlanDump [query ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
