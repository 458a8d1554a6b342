package graft
object ScratchDivGolden {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("scratch", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("diversity_sample_trained")(spark, "/root/testdata/sf0.01")
    val rows = df.orderBy("pick_order").collect()
    rows.foreach(r => println(s"GOLDEN (${r.getInt(0)}, ${r.getLong(1)}, ${r.getInt(2)}, ${r.getInt(3)}),"))
    println(s"GOLDEN-N ${rows.length}")
    // run twice to confirm determinism within a session
    val again = SparkEntry.queries("diversity_sample_trained")(spark, "/root/testdata/sf0.01").orderBy("pick_order").collect()
    println(s"GOLDEN-STABLE ${rows.sameElements(again)}")
    spark.stop()
  }
}
