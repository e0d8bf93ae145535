package graft.catalog

import java.util.concurrent.{LinkedBlockingQueue, ThreadFactory, ThreadPoolExecutor, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.ExecutionContext
import scala.concurrent.duration._

/** Dedicated bounded pool for driver-side filesystem metadata I/O
  * (footer reads, listing fan-outs) that runs INSIDE a commit's
  * write-permit critical section. Two properties the shared global
  * `ExecutionContext` cannot give:
  *
  *  - isolation: blocking filesystem opens never starve the
  *    CPU-sized global pool other driver work (AQE callbacks,
  *    broadcast relations) schedules on;
  *  - boundedness: the thread count is fixed (I/O-sized, not
  *    CPU-sized), and callers pair it with a FINITE deadline so one
  *    hung open degrades to the caller's advisory-failure path
  *    instead of holding the table's write permit forever.
  *
  * Threads are daemons and idle out after 60 s, so an application
  * that never commits pays nothing.
  */
private[graft] object GraftIO {

  private val poolSize: Int =
    math.min(32, math.max(8, Runtime.getRuntime.availableProcessors()))

  private val counter = new AtomicInteger(0)

  private val executor: ThreadPoolExecutor = {
    val tf = new ThreadFactory {
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-io-${counter.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    }
    val e = new ThreadPoolExecutor(poolSize, poolSize, 60L, TimeUnit.SECONDS,
      new LinkedBlockingQueue[Runnable](), tf)
    e.allowCoreThreadTimeOut(true)
    e
  }

  val ec: ExecutionContext = ExecutionContext.fromExecutor(executor)

  /** Deadline for a batch of per-file footer reads: a generous
    * per-file budget amortized over the pool's parallelism, floored so
    * tiny batches on a cold filesystem never time out spuriously. A
    * miss is ADVISORY by contract — every caller catches the
    * `TimeoutException` on its log-and-skip path. */
  def footerReadDeadline(files: Int): FiniteDuration = {
    val perFileSec = 10L
    val waves = math.max(1L, math.ceil(files.toDouble / poolSize).toLong)
    math.max(60L, waves * perFileSec).seconds
  }
}
