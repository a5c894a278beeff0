package graft

/** Dev tool: print plan-shape facts for named query entries — the initial
  * adaptive plan (pre-execution) plus, after running the query at
  * sf0.001, whether AQE's exchange reuse collapsed duplicate subtrees
  * (the funnel/retention/PMI plans deliberately lean on it: their logical
  * plans reference a shared relation twice and the runtime executes it
  * once). PlanShapeSpec pins the properties; this prints them for eyes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "8")
      // UTC pin matches the PlanShapeSpec/Bench sessions, so an eyeball
      // dump never disagrees with a pinned plan over timezone casts
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    // no args → all queries (alphabetical), not a silent empty run
    val names = if (args.nonEmpty) args.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, sf)
      val initial = df.queryExecution.executedPlan.toString
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"\n===== $q ===== reusedExchanges=${"ReusedExchange".r.findAllIn(p).length}")
      println(initial.take(3000))
    }
    spark.stop()
  }
}
