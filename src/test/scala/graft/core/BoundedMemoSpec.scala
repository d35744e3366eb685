package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[BoundedMemo]]'s contract — the r15 verdict's memo-hygiene
  * mandate: the six session memos must no longer grow without bound.
  * Capacity eviction, recency, dead-key purge (the stopped-session path,
  * exercised here through the injected predicate the Dedup memos wire to
  * `sparkContext.isStopped`), the release hook on every eviction path,
  * and the inherited best-effort race semantics (first insert wins).
  */
class BoundedMemoSpec extends AnyFunSuite {

  test("LRU eviction beyond capacity releases the coldest entry") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = new BoundedMemo[Int, String](2, onEvict = evicted += _)
    m.put(1, "a"); m.put(2, "b"); m.put(3, "c")
    assert(m.size == 2)
    assert(evicted.toSeq == Seq("a"))
    assert(m.get(1).isEmpty && m.get(2).contains("b") && m.get(3).contains("c"))
  }

  test("a hit refreshes recency, so the re-touched entry survives") {
    val m = new BoundedMemo[Int, String](2)
    m.put(1, "a"); m.put(2, "b")
    assert(m.getOrElseUpdate(1, fail("must hit")) == "a") // 1 becomes MRU
    m.put(3, "c") // evicts 2, not 1
    assert(m.get(1).contains("a") && m.get(2).isEmpty)
  }

  test("dead keys are purged and released on the next touch") {
    val dead = scala.collection.mutable.Set.empty[Int]
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = new BoundedMemo[Int, String](8, isDead = dead, onEvict = evicted += _)
    m.put(1, "a"); m.put(2, "b")
    dead += 1 // the session behind key 1 stops
    assert(m.getOrElseUpdate(3, "c") == "c") // any mutating touch purges
    assert(m.get(1).isEmpty, "stopped key must be gone")
    assert(evicted.toSeq == Seq("a"))
    assert(m.get(2).contains("b") && m.get(3).contains("c"))
  }

  test("getOrElseUpdate computes once and serves hits") {
    var computes = 0
    val m = new BoundedMemo[Int, String](4)
    assert(m.getOrElseUpdate(1, { computes += 1; "v" }) == "v")
    assert(m.getOrElseUpdate(1, { computes += 1; "w" }) == "v")
    assert(computes == 1)
  }

  test("a raced insert keeps the first value and releases the loser's") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = new BoundedMemo[Int, String](4, onEvict = evicted += _)
    // simulate the race: the compute thunk itself inserts first
    val winner = m.getOrElseUpdate(1, { m.put(1, "first"); "second" })
    assert(winner == "first")
    assert(evicted.toSeq == Seq("second"))
    assert(m.get(1).contains("first"))
  }

  test("putIfAbsent returns the prior and never overwrites") {
    val m = new BoundedMemo[Int, String](4)
    assert(m.putIfAbsent(1, "a").isEmpty)
    assert(m.putIfAbsent(1, "b").contains("a"))
    assert(m.get(1).contains("a"))
  }

  test("remove hands the value back without the release hook") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = new BoundedMemo[Int, String](4, onEvict = evicted += _)
    m.put(1, "a")
    assert(m.remove(1).contains("a"))
    assert(evicted.isEmpty && m.size == 0)
  }

  test("clear releases everything through the hook") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = new BoundedMemo[Int, String](4, onEvict = evicted += _)
    m.put(1, "a"); m.put(2, "b")
    m.clear()
    assert(m.size == 0 && evicted.toSet == Set("a", "b"))
  }

  test("a throwing release hook never fails the caller") {
    val m = new BoundedMemo[Int, String](1,
      onEvict = _ => sys.error("unpersist on a stopped session"))
    m.put(1, "a"); m.put(2, "b") // evicts "a", hook throws, swallowed
    assert(m.get(2).contains("b"))
    m.clear() // hook throws again, swallowed
    assert(m.size == 0)
  }

  test("keys reflects live entries") {
    val m = new BoundedMemo[Int, String](4)
    m.put(1, "a"); m.put(2, "b")
    assert(m.keys.toSet == Set(1, 2))
  }

  test("put over an existing key releases the DISPLACED value, never the live one") {
    val released = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = new BoundedMemo[Int, String](4, onEvict = v => released += v)
    val a = new String("a") // distinct object identities on purpose
    val a2 = new String("a")
    m.put(1, a)
    m.put(1, a2) // displaces `a` — must route it through onEvict
    assert(released.toSeq == Seq("a"))
    assert(m.get(1).exists(_ eq a2))
    m.put(1, a2) // re-putting the SAME object must NOT release it
    assert(released.toSeq == Seq("a"))
    assert(m.get(1).exists(_ eq a2))
  }

  test("concurrent hammering never corrupts the map or exceeds capacity") {
    // the real consumers race Verify/Bench query threads on shared memos;
    // this pins that the lock discipline (compute outside, map ops inside)
    // survives contention: every caller gets SOME value computed for ITS
    // key, size never exceeds capacity, and no op throws
    val m = new BoundedMemo[Int, String](4)
    val computes = new java.util.concurrent.atomic.AtomicInteger
    val errors = new java.util.concurrent.atomic.AtomicInteger
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val tasks = (0 until 800).map { i => () =>
      try {
        val k = i % 16
        val v = m.getOrElseUpdate(k, { computes.incrementAndGet(); s"v$k" })
        if (v != s"v$k") errors.incrementAndGet()
        if (i % 7 == 0) m.remove(i % 16): Unit
        if (i % 11 == 0) m.keys: Unit
        if (m.size > 4) errors.incrementAndGet()
      } catch { case _: Throwable => errors.incrementAndGet() }
    }
    import scala.jdk.CollectionConverters._
    pool.invokeAll(tasks.map(t =>
      new java.util.concurrent.Callable[Unit] { def call(): Unit = t() }).asJava)
    pool.shutdown()
    assert(errors.get() == 0, s"${errors.get()} racing callers saw a wrong value, a size breach, or a throw")
    // NB: 16 keys thrash a capacity-4 LRU by design — this test is about
    // correctness under contention, not hit rate (the single-threaded
    // "computes once" test pins caching); just confirm work happened
    assert(computes.get() >= 16)
    assert(m.size <= 4)
  }
}
