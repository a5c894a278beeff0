package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: per-query timing with progressive output. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop write, not count(): count lets Catalyst prune whole joins
      val n = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); 0L }
        catch { case e: Throwable => println(s"FAIL $name: ${e.getMessage.take(200)}"); -1L }
      println(f"TIMING ${(System.nanoTime() - t0) / 1e9}%8.2f s  $name%-24s rows=$n")
    }
    spark.stop()
  }
}
