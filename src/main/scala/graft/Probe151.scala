package graft
import org.apache.spark.sql.SparkSession
object Probe151 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.optimizedPlan.toString
    println("REGEXP_REPLACE_COUNT=" + "regexp_replace".r.findAllIn(p).length)
    println("REPLACE_COUNT=" + "replace\\(".r.findAllIn(p).length)
    println("FILTER_HOF_COUNT=" + "filter\\(".r.findAllIn(p).length)
    println("PLAN_LINES=" + p.linesIterator.length)
    spark.stop()
  }
}
