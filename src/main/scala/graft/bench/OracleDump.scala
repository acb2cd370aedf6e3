package graft.bench
import org.apache.spark.sql.SparkSession

/** Spot-check one catalog query against its DuckDB twin without a full
  * Verify run: dumps the Spark result + oracle SQL for `name` to /tmp. */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, dir)
      .write.mode("overwrite").parquet(s"/tmp/oracle_spot/$name")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/oracle_spot.sql"),
      graft.SparkEntry.oracleSql(name).getBytes("UTF-8"))
    println(s"[dump] wrote /tmp/oracle_spot/$name and /tmp/oracle_spot.sql")
    spark.stop()
  }
}
