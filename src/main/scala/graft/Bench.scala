package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale
  * factor and prints exactly ONE machine-parseable JSON line on stdout
  * (the final line), also mirrored to BENCH_LOCAL.json. A failing query
  * is recorded as -1 in "queries" plus a message in "errors" — a
  * regression can never masquerade as a timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warm up codegen/classloading/file-listing once so the first timed
    // query doesn't absorb session initialization.
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors  = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        timings(name) = -1.0
        errors(name) = e.toString.linesIterator.next().take(160)
      }
    }
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val qs = timings.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = timings.values.filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_failed":${errors.size},"sf":"${esc(sfDir)}"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), line)
    spark.stop()
    // Printed after spark.stop() so it is the last stdout line.
    println(line)
    System.out.flush()
  }
}
