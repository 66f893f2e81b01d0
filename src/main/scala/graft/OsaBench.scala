package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.osa_distance
object OsaBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def strs(c: org.apache.spark.sql.Column) =
      concat(lit("4000"), lit("_"), c.cast("string"))
    def runOsa(n: Long, par: Int): Double = {
      val t0 = System.nanoTime()
      spark.range(0, n, 1, par)
        .select(osa_distance(strs(col("id") % 100000 + 10000),
          strs((col("id") + 7) % 99999 + 10000)).as("d"))
        .agg(sum(col("d"))).head()
      (System.nanoTime() - t0) / 1e9
    }
    def runBase(n: Long, par: Int): Double = {
      val t0 = System.nanoTime()
      spark.range(0, n, 1, par)
        .select((length(strs(col("id") % 100000 + 10000)) +
          length(strs((col("id") + 7) % 99999 + 10000))).as("d"))
        .agg(sum(col("d"))).head()
      (System.nanoTime() - t0) / 1e9
    }
    runOsa(10000000L, 32); runBase(10000000L, 32)
    println(f"[osa] base 200M 32-way: ${runBase(200000000L, 32)}%.1fs")
    println(f"[osa] osa  200M 32-way: ${runOsa(200000000L, 32)}%.1fs")
    println(f"[osa] base 50M 1-way:  ${runBase(50000000L, 1)}%.1fs")
    println(f"[osa] osa  50M 1-way:  ${runOsa(50000000L, 1)}%.1fs")
    spark.stop()
  }
}
