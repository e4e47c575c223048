package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Temporary round-19 diagnostic: dump the OPQ chain's intermediates for
  * stage-by-stage comparison against the DuckDB oracle CTEs. */
object DebugOpq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/tmp/opqdbg"
    val spark = SparkSession.builder().master("local[16]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Storage.pinBucketedScans(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.kmeansFit(e, k = 8, iters = 2)
    val res = Similarity.ivfResiduals(e, cents)
    val (r, books) = Similarity.opqFitRotation(res, m = 8, ksub = 16,
      iters = 2, sweeps = 2)
    // 1. rotation matrix
    import spark.implicits._
    r.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq
      .toDF("i", "row").coalesce(1).write.mode("overwrite").parquet(s"$out/rmat")
    // 2. rotated residuals
    res.withColumn("rv", Similarity.rotate(col("res"), r))
      .select(col("vec_id"), col("cell_id"), col("rv"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/ror")
    // 3. books
    books.zipWithIndex.flatMap { case (b, s) =>
      b.map { case (cid, v) => (s, cid, v.toSeq) }
    }.toDF("sub", "cid", "v").coalesce(1).write.mode("overwrite")
      .parquet(s"$out/books")
    // 4. index codes
    Similarity.ivfPqIndexOpq(e, cents, r, books)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/codes")
    // 5. rotated probes
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val q50 = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding"))
    Similarity.ivfPqOpqProbes(q, cents, r, nprobe = 2)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/probes")
    // quantization-error ladder: residual books vs OPQ at 1..4 sweeps
    def err(rel: org.apache.spark.sql.DataFrame,
        bks: IndexedSeq[IndexedSeq[(Int, Array[Double])]], vc: String) =
      Similarity.pqEncode(rel, bks, vecCol = vc)
        .agg(sum(col("dist"))).collect()(0).getDouble(0)
    val resBooks = Similarity.pqFitCodebooksResidual(e, cents, m = 8,
      ksub = 16, iters = 2)
    println(f"ERR residual(identity): ${err(res.select(col("vec_id"), col("res")), resBooks, "res")}%.4f")
    for (sw <- 2 to 4) {
      val (rw, bw) = Similarity.opqFitRotation(res, m = 8, ksub = 16,
        iters = 2, sweeps = sw)
      val rotRel = res.select(col("vec_id"),
        Similarity.rotate(col("res"), rw).as("rv"))
      println(f"ERR opq sweeps=$sw: ${err(rotRel, bw, "rv")}%.4f")
      // orthogonality check
      val dim = rw.length
      var worst = 0.0
      for (i <- 0 until dim; j <- 0 until dim) {
        val dotv = (0 until dim).map(k2 => rw(i)(k2) * rw(j)(k2)).sum
        val want = if (i == j) 1.0 else 0.0
        worst = math.max(worst, math.abs(dotv - want))
      }
      println(f"ORTHO worst dev sweeps=$sw: $worst%.2e")
      // recall@10 with R=40 rerank, and the R=40 shortlist coverage
      def ids(df: org.apache.spark.sql.DataFrame): Map[Any, Set[Long]] =
        df.collect().groupBy(_.get(0))
          .map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }
      val exact = ids(Similarity.bruteForceTopK(e, q, k = 10))
      def rec(df: org.apache.spark.sql.DataFrame): Double = {
        val a = ids(df)
        exact.map { case (g, ex) =>
          (a.getOrElse(g, Set.empty) & ex).size.toDouble / ex.size
        }.sum / exact.size
      }
      val idxw = Similarity.ivfPqIndexOpq(e, cents, rw, bw)
      val probesw = Similarity.ivfPqOpqProbes(q, cents, rw, nprobe = 2)
      val r40 = rec(Similarity.ivfPqResidualTopKRerankFromIndex(
        idxw, probesw, q, e, bw, k = 10, r = 40))
      println(f"RECALL rerank40 sweeps=$sw: $r40%.3f")
      // 50-query comparison (statistical weight)
      def ids50(df: org.apache.spark.sql.DataFrame): Map[Any, Set[Long]] =
        df.collect().groupBy(_.get(0))
          .map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }
      val exact50 = ids50(Similarity.bruteForceTopK(e, q50, k = 10))
      def rec50(df: org.apache.spark.sql.DataFrame): Double = {
        val a = ids50(df)
        exact50.map { case (g, ex) =>
          (a.getOrElse(g, Set.empty) & ex).size.toDouble / ex.size
        }.sum / exact50.size
      }
      val probes50 = Similarity.ivfPqOpqProbes(q50, cents, rw, nprobe = 2)
      val o50 = rec50(Similarity.ivfPqResidualTopKRerankFromIndex(
        idxw, probes50, q50, e, bw, k = 10, r = 40))
      println(f"RECALL50 opq rerank40 sweeps=$sw: $o50%.3f")
    }
    // residual 50-query reference
    {
      def ids50(df: org.apache.spark.sql.DataFrame): Map[Any, Set[Long]] =
        df.collect().groupBy(_.get(0))
          .map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }
      val exact50 = ids50(Similarity.bruteForceTopK(e, q50, k = 10))
      def rec50(df: org.apache.spark.sql.DataFrame): Double = {
        val a = ids50(df)
        exact50.map { case (g, ex) =>
          (a.getOrElse(g, Set.empty) & ex).size.toDouble / ex.size
        }.sum / exact50.size
      }
      val ridx = Similarity.ivfPqIndexResidual(e, cents, resBooks)
      val rp50 = Similarity.ivfPqResidualProbes(q50, cents, nprobe = 2)
      val rr50 = rec50(Similarity.ivfPqResidualTopKRerankFromIndex(
        ridx, rp50, q50, e, resBooks, k = 10, r = 40))
      println(f"RECALL50 residual rerank40: $rr50%.3f")
      val rawB = Similarity.pqFitCodebooks(e, m = 8, ksub = 16, iters = 2)
      val raw50 = rec50(Similarity.ivfPqTopKRerank(e, q50, cents, rawB,
        nprobe = 2, k = 10, r = 40))
      println(f"RECALL50 raw rerank40: $raw50%.3f")
    }
    spark.stop()
  }
}
