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
