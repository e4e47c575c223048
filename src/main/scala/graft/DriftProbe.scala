package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001","sf0.01","sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet").select(col("vec_id"), col("embedding"))
      val cents = Similarity.kmeansFit(e, 8, 2)
      val books = Similarity.pqFitCodebooksResidual(e, cents, 8, 16, 2)
      val (n0, t0) = Similarity.residualQuantizationError(e, cents, books)
      val drifted = e.select((col("vec_id")+1000000).as("vec_id"), transform(col("embedding"), x => x * 3.0d).as("embedding"))
      val (n1, t1) = Similarity.residualQuantizationError(drifted, cents, books)
      println(f"DRIFT $sf base n=$n0 total=$t0%.4f perRow=${t0/n0}%.6f drifted n=$n1 total=$t1%.4f perRow=${t1/n1}%.6f ratio=${(t1/n1)/(t0/n0)}%.3f")
    }
    spark.stop()
  }
}
