package graft.bench

import org.apache.spark.sql.SparkSession

/** Probe: does local-cluster mode (real executor JVMs) work here? */
object TryCluster {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,4096]")
      .config("spark.executor.memory", "4g")
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = spark.range(0, 1000000, 1, 16).as[Long]
      .map(_ * 2).filter(_ % 3 == 0).count()
    val hosts = spark.sparkContext.parallelize(1 to 64, 64)
      .map(_ => java.lang.management.ManagementFactory.getRuntimeMXBean.getName)
      .distinct().collect()
    println(s"[trycluster] count=$n executors=${hosts.length} ids=${hosts.mkString(";")}")
    spark.stop()
  }
}
