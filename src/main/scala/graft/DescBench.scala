package graft
import org.apache.spark.sql.SparkSession
import graft.queries.Tables
import graft.stats.DescribeStats
object DescBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    for (i <- 1 to 2) {
      var t0 = System.nanoTime()
      val a = DescribeStats.describe(li, cols).collect()
      println(f"[descbench] percentile-agg run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      t0 = System.nanoTime()
      val b = DescribeStats.describeSorted(li, cols).collect()
      println(f"[descbench] sorted run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      t0 = System.nanoTime()
      val d = DescribeStats.describeTDigest(li, cols).collect()
      println(f"[descbench] tdigest run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      if (i == 1) {
        val am0 = a.map(r => r.getString(0) -> r).toMap
        val dm = d.map(r => r.getString(0) -> r).toMap
        // span-relative error: |approx − exact| / (max − min) — scale-free
        // (plain relative error explodes on near-zero discrete values
        // like l_discount without meaning anything rank-wise)
        val qerr = cols.flatMap { c =>
          val span = am0(c).getDouble(am0(c).fieldIndex("max")) -
            am0(c).getDouble(am0(c).fieldIndex("min"))
          Seq("p25", "p50", "p75").map { f =>
            val e = am0(c).getDouble(am0(c).fieldIndex(f))
            val t = dm(c).getDouble(dm(c).fieldIndex(f))
            math.abs(t - e) / math.max(1e-12, span)
          }
        }
        println(f"[descbench] tdigest max span-relative quantile err ${qerr.max}%.5f")
      }
      if (i == 1) {
        val am = a.map(r => r.getString(0) -> (1 to 9).map(r.getDouble).toSeq).toMap
        val bm = b.map(r => r.getString(0) -> (1 to 9).map(r.getDouble).toSeq).toMap
        val diffs = cols.flatMap(c => am(c).zip(bm(c)).filter{case (x,y) => math.abs(x-y) > 1e-9 * math.max(1,math.abs(x))})
        println(s"[descbench] value diffs beyond 1e-9 rel: ${diffs.size}")
      }
    }
    spark.stop()
  }
}
