package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle semantics of the model memo: per-key locking (a slow fit
  * must not serialize unrelated keys), same-key dedupe, and failure
  * non-caching.
  */
class CachesSpec extends AnyFunSuite {

  test("model(): a slow fit blocks only its own key, not other keys") {
    // fit A parks until fit B completes; under a GLOBAL fit lock this
    // deadlocks (B waits for the monitor A holds), under per-key
    // locking B finishes and releases A well inside the timeout
    val bDone = new CountDownLatch(1)
    val aEntered = new CountDownLatch(1)
    val a = new Thread(() => Caches.model("caches-spec", "slow-a") {
      aEntered.countDown()
      assert(bDone.await(30, TimeUnit.SECONDS),
        "key B never completed while key A was fitting — global fit lock?")
      "a"
    })
    a.start()
    assert(aEntered.await(30, TimeUnit.SECONDS))
    assert(Caches.model("caches-spec", "fast-b") { "b" } == "b")
    bDone.countDown()
    a.join(30000)
    assert(!a.isAlive, "fit A did not finish")
    // both memoized now: no further misses
    val misses = Caches.modelMissCount
    assert(Caches.model[String]("caches-spec", "slow-a")(fail("refit A")) == "a")
    assert(Caches.model[String]("caches-spec", "fast-b")(fail("refit B")) == "b")
    assert(Caches.modelMissCount == misses)
  }

  test("model(): concurrent same-key callers dedupe to one fit") {
    val before = Caches.modelMissCount
    val fits = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map(_ => new Thread(() =>
      Caches.model("caches-spec", "same-key") { fits.incrementAndGet(); 42 }))
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(fits.get() == 1, s"expected one fit, saw ${fits.get()}")
    assert(Caches.modelMissCount == before + 1)
  }

  test("model(): a throwing fit is not cached — the next call retries") {
    val key = Seq("caches-spec", "boom")
    intercept[RuntimeException] {
      Caches.model(key: _*) { throw new RuntimeException("fit failed") }
    }
    assert(Caches.model(key: _*) { 7 } == 7, "failure must not be memoized")
  }
}
