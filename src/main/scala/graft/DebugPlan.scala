package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Window

object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Storage.pinBucketedScans(spark)
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    df.queryExecution.optimizedPlan.foreach {
      case w: Window if w.partitionSpec.isEmpty =>
        println("GLOBAL-WINDOW-IN-RESULT: " + w.windowExpressions)
      case _ =>
    }
    println("RESULT-PLAN-OK")
    spark.stop()
  }
}
