package graft.tools
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named SparkEntry queries to files —
  * the plan evidence the optimization rounds commit under `plans/`
  * (the judge checks plan claims against these files).
  *
  *   sbt "runMain graft.tools.PlanDump <outDir> <suffix> <query>..."
  *
  * Writes `<outDir>/<query>_<suffix>.txt`. Uses sf0.1 like the bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val dir = "/root/testdata/sf0.1"
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
