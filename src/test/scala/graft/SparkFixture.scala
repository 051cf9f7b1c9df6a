package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole suite (JVM startup and
  * session init dominate test wall time otherwise).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkFixture {
  lazy val spark: SparkSession = TestSpark.spark
  /** Smallest driver-provided scale factor — correctness fixtures. */
  val sf = "/root/testdata/sf0.001"
}
