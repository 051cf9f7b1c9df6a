package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The substrate publish protocol: atomic first-writer-wins landing,
  * _SUCCESS-guarded rebuild skip (the cross-JVM convergence claim),
  * debris cleanup, and the corpus fingerprint folding regeneration
  * into the key (stale-serving). Each test drives
  * [[Substrate.materialized]] with its own kind string and a private
  * corpus dir so runs can't collide.
  */
class SubstrateSpec extends AnyFunSuite with SparkFixture {

  /** A tiny private corpus dir (one parquet file) the fingerprint can
    * observe changing. */
  private def newCorpus(tag: String, n: Int): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_substrate_$tag").toString
    (1 to n).map(_.toLong).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    dir
  }

  private def plan(dir: String) =
    spark.read.parquet(s"$dir/t.parquet").select(sum("v").as("s"))

  test("build lands atomically with _SUCCESS; a second session-miss skips the rebuild") {
    val corpus = newCorpus("skip", 10)
    var builds = 0
    def build() = { builds += 1; plan(corpus) }
    val p1 = Substrate.materialized(spark, "spec_skip", corpus, Nil)(build())
    assert(Files.exists(Paths.get(p1, "_SUCCESS")), "published leaf must carry the marker")
    assert(builds == 1)
    // same-JVM repeat: the memo short-circuits
    val p2 = Substrate.materialized(spark, "spec_skip", corpus, Nil)(build())
    assert(p2 == p1 && builds == 1, "memo hit must not rebuild")
    // simulate a FRESH JVM (memo gone, leaf on disk): the _SUCCESS
    // check must skip the plan entirely — this is the cross-JVM
    // convergence contract (a reader's files are never overwritten)
    Caches.clearModels()
    val before = Files.list(Paths.get(p1)).toArray.map(_.toString).toSet
    val p3 = Substrate.materialized(spark, "spec_skip", corpus, Nil)(build())
    assert(p3 == p1 && builds == 1, "_SUCCESS-marked leaf must not be rebuilt")
    assert(Files.list(Paths.get(p1)).toArray.map(_.toString).toSet == before,
      "the published files must be untouched byte-for-byte (same part names)")
  }

  test("a marker-less debris leaf is cleared and rebuilt; no temp leaves survive") {
    val corpus = newCorpus("debris", 7)
    val p1 = Substrate.materialized(spark, "spec_debris", corpus, Nil)(plan(corpus))
    // strip the marker — pre-atomic-layout debris / foreign partial dir
    Files.delete(Paths.get(p1, "_SUCCESS"))
    Caches.clearModels()
    val p2 = Substrate.materialized(spark, "spec_debris", corpus, Nil)(plan(corpus))
    assert(p2 == p1 && Files.exists(Paths.get(p1, "_SUCCESS")),
      "debris must be replaced by a fresh _SUCCESS-marked publish")
    // the temp staging leaves (dot-prefixed) must not accumulate
    val base = Paths.get(p1).getParent
    val temps = Files.list(base).toArray.map(_.toString)
      .filter(_.contains("/.spec_debris"))
    assert(temps.isEmpty, s"staging leaves left behind: ${temps.toSeq}")
  }

  test("regenerating the corpus in place derives a NEW leaf (fingerprint in the key)") {
    import spark.implicits._
    val corpus = newCorpus("stale", 5)
    val p1 = Substrate.materialized(spark, "spec_stale", corpus, Nil)(plan(corpus))
    val v1 = spark.read.parquet(p1).head().getLong(0)
    assert(v1 == 15L)
    // regenerate the corpus AT THE SAME PATH with different content —
    // the long-lived-JVM staleness scenario; the fingerprint memo is
    // per-JVM state a fresh session would not carry
    (1 to 6).map(_.toLong).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(s"$corpus/t.parquet")
    Caches.clearModels()
    val p2 = Substrate.materialized(spark, "spec_stale", corpus, Nil)(plan(corpus))
    assert(p2 != p1, "a changed corpus must land in a fresh content-keyed leaf")
    assert(spark.read.parquet(p2).head().getLong(0) == 21L,
      "the new leaf must serve the regenerated corpus, not stale bytes")
    // and the OLD leaf is still intact for any reader mid-query on it
    assert(Files.exists(Paths.get(p1, "_SUCCESS")))
    assert(spark.read.parquet(p1).head().getLong(0) == 15L)
  }
}
