package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{ConcurrentMaintenanceException, MaintenanceLock, VortexDelete, VortexUpdate}

/** Writer-vs-writer mutual exclusion (VERDICT r11 "What's wrong" #1):
  * two maintenance statements racing on one dataset must never
  * interleave into a lost update — the shared deterministic
  * replacement names (md5 of the source basename) would let statement
  * A's deletions be silently resurrected by statement B's rename.
  * The MaintenanceLock lease serializes writers: one wins, the other
  * fails loudly with ConcurrentMaintenanceException; retrying the
  * loser converges to the serial execution of both. */
class ConcurrentMaintenanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("vortex_conc").toString

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stage(dir: String, rows: Long = 3000L): Unit = {
    import spark.implicits._
    (0L until rows).map(i => (i, s"v$i", i % 10)).toDF("k", "s", "m")
      .repartition(4).write.format("vortex").mode("overwrite").save(dir)
  }

  test("a held lease makes a second maintenance statement fail loudly") {
    val dir = tmp()
    stage(dir)
    val lease = MaintenanceLock.acquire(fs, new Path(dir), "test")
    val e = intercept[ConcurrentMaintenanceException] {
      VortexDelete.delete(spark, dir, col("m") === 0)
    }
    assert(e.getMessage.contains("another maintenance statement"))
    // nothing was mutated by the aborted statement
    assert(spark.read.format("vortex").load(dir).count() == 3000L)
    lease.release()
    // after release the same statement proceeds
    VortexDelete.delete(spark, dir, col("m") === 0)
    assert(spark.read.format("vortex").load(dir).count() == 2700L)
  }

  test("racing DELETE + UPDATE from two threads: no lost update, loser retries to serial result") {
    val dir = tmp()
    stage(dir)
    // disjoint predicates → the serial result is order-independent:
    // DELETE m=1 (300 rows gone), UPDATE m=2 → s='X' (300 rows tagged)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def run(body: => Unit): Thread = {
      val t = new Thread(() => try body catch { case e: Throwable => errs.add(e) })
      t.start(); t
    }
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val t1 = run { barrier.await(); VortexDelete.delete(spark, dir, col("m") === 1) }
    val t2 = run { barrier.await(); VortexUpdate.update(spark, dir,
      Map("s" -> lit("X")), col("m") === 2) }
    t1.join(120000); t2.join(120000)
    // every failure must be the loud lock abort, never a silent merge
    errs.forEach(e => assert(e.isInstanceOf[ConcurrentMaintenanceException],
      s"unexpected failure class: $e"))
    assert(errs.size() <= 1, "at most one of two racers can lose")
    // retry whichever op lost (both are idempotent over their output)
    VortexDelete.delete(spark, dir, col("m") === 1)
    VortexUpdate.update(spark, dir, Map("s" -> lit("X")), col("m") === 2)
    val out = spark.read.format("vortex").load(dir)
    assert(out.count() == 2700L)
    assert(out.filter(col("m") === 1).count() == 0L)
    assert(out.filter(col("s") === "X").count() == 300L)
    assert(out.filter(col("m") === 2 && col("s") =!= "X").count() == 0L)
    // the lease file is gone once every statement finished
    assert(!fs.exists(new Path(dir, ".vortex-maint.lock")))
  }

  test("a crashed statement releases its lease (finally) and a stale lease breaks after TTL") {
    val dir = tmp()
    stage(dir)
    // crash mid-commit via the test seam: the lease must release anyway
    intercept[Exception] {
      VortexDelete.deleteImpl(spark, dir, col("m") === 3, failAfterCommits = 0)
    }
    assert(!fs.exists(new Path(dir, ".vortex-maint.lock")),
      "the finally-release must drop the lease on statement failure")
    // re-run converges (the standing crash contract), now under the lock
    VortexDelete.delete(spark, dir, col("m") === 3)
    assert(spark.read.format("vortex").load(dir).filter(col("m") === 3).count() == 0L)

    // a lease whose holder crashed WITHOUT the finally (hard kill):
    // fabricate one with an old mtime — the next acquirer breaks it
    val lock = new Path(dir, ".vortex-maint.lock")
    val out = fs.create(lock, true)
    out.write("""{"id":"dead-holder","ts":0}""".getBytes("UTF-8")); out.close()
    fs.setTimes(lock, System.currentTimeMillis() - 20L * 60 * 1000, -1)
    VortexDelete.delete(spark, dir, col("m") === 4) // breaks stale lease, proceeds
    assert(spark.read.format("vortex").load(dir).filter(col("m") === 4).count() == 0L)
    assert(!fs.exists(lock))
  }

  test("direct lock API: acquire, contend, release, reacquire") {
    val dir = tmp()
    fs.mkdirs(new Path(dir))
    val a = MaintenanceLock.acquire(fs, new Path(dir), "a")
    intercept[ConcurrentMaintenanceException] {
      MaintenanceLock.acquire(fs, new Path(dir), "b")
    }
    a.release()
    val b = MaintenanceLock.acquire(fs, new Path(dir), "b")
    b.release()
    assert(!fs.exists(new Path(dir, ".vortex-maint.lock")))
  }

  test("an ACTIVE heartbeat keeps the lease unbreakable past its TTL (r13)") {
    // a long-running statement's lease goes past ttlMs in AGE but the
    // ttl/5 heartbeat keeps refreshing the mtime — a second writer
    // arriving after several TTLs must still fail loudly, never break
    // a live holder's lease (only a CRASHED holder's mtime goes stale)
    val dir = tmp()
    fs.mkdirs(new Path(dir))
    val lease = MaintenanceLock.acquire(fs, new Path(dir), "a", ttlMs = 5000)
    try {
      Thread.sleep(12000) // > 2 TTLs; heartbeat fires every max(ttl/5, 1s)
      val e = intercept[ConcurrentMaintenanceException] {
        MaintenanceLock.acquire(fs, new Path(dir), "b", ttlMs = 5000)
      }
      assert(e.getMessage.contains("holds"), e.getMessage)
    } finally lease.release()
    // once released, the next writer acquires immediately
    MaintenanceLock.acquire(fs, new Path(dir), "c", ttlMs = 5000).release()
  }

  test("concurrent double-release frees the gate exactly once (r13)") {
    // release() may come from a different thread than acquired (the
    // reason Gate is a Semaphore); two racing release() calls through a
    // plain flag guard would release twice → permits=2 → two later
    // writers both "hold" the lock (review-found r12). CAS guard: hammer
    // release from many threads, then prove mutual exclusion still holds.
    val dir = tmp()
    fs.mkdirs(new Path(dir))
    for (_ <- 0 until 20) {
      val lease = MaintenanceLock.acquire(fs, new Path(dir), "a")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try (0 until 8).map(_ => pool.submit(new Runnable {
        def run(): Unit = lease.release()
      })).foreach(_.get())
      finally pool.shutdown()
      val b = MaintenanceLock.acquire(fs, new Path(dir), "b")
      intercept[ConcurrentMaintenanceException] {
        MaintenanceLock.acquire(fs, new Path(dir), "c") // permits must be 0, not leaked
      }
      b.release()
    }
  }

  test("hammered same-process acquire: never two concurrent holders (r12 fuzz-found TOCTOU)") {
    // RawLocalFileSystem's create(overwrite=false) is exists-check +
    // TRUNCATING create, so the file protocol alone let two threads
    // both pass read-back verify (the op=race fuzz kind hit it as a
    // lost source file mid-commit). The JVM gate must make
    // same-process racing exact: N threads in tight acquire/release
    // loops, holder count asserted never above 1.
    val dir = tmp()
    fs.mkdirs(new Path(dir))
    val root = new Path(dir)
    val holders = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val acquired = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ths = (0 until 8).map { i =>
      new Thread(() => {
        try {
          val deadline = System.nanoTime() + 2_000_000_000L
          while (System.nanoTime() < deadline) {
            try {
              val l = MaintenanceLock.acquire(fs, root, s"t$i")
              val h = holders.incrementAndGet()
              maxSeen.getAndUpdate(m => math.max(m, h))
              acquired.incrementAndGet()
              Thread.sleep(1)
              holders.decrementAndGet()
              l.release()
            } catch { case _: ConcurrentMaintenanceException => () }
          }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    ths.foreach(_.start()); ths.foreach(_.join())
    assert(errs.isEmpty, s"unexpected: ${errs.peek()}")
    assert(acquired.get() > 10, s"lock livelocked (only ${acquired.get()} acquisitions)")
    assert(maxSeen.get() == 1, s"two concurrent holders observed (${maxSeen.get()})")
  }
}
