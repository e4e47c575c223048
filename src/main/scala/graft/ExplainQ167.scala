package graft
import org.apache.spark.sql.SparkSession
object ExplainQ167 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("q167_src_jaccard_sketch")(spark, "/root/testdata/sf0.001")
    df.explain("formatted")
    spark.stop()
  }
}
