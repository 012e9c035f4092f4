package graft

import java.util.concurrent.{Callable, ExecutionException, Executors, TimeUnit}

/** Concurrent driver-side job submission for per-chunk maintenance (DML,
  * compression, reorder, refresh batches). Spark's scheduler interleaves
  * jobs submitted from separate threads, so N small per-chunk jobs overlap
  * instead of paying N × job-launch latency sequentially — the per-chunk
  * loops were the reference-noted scale gap at 1,000 touched chunks.
  *
  * Results come back in input order; the first failure is rethrown after
  * the pool drains (no half-cancelled rewrites).
  */
object Par {
  val DefaultParallelism = 8

  def map[A, B](items: Seq[A], parallelism: Int = DefaultParallelism)(fn: A => B): Seq[B] = {
    if (items.isEmpty) return Seq.empty
    if (items.size == 1) return items.map(fn)
    val pool = Executors.newFixedThreadPool(math.min(parallelism, items.size))
    try {
      val futures = items.map(a => pool.submit(new Callable[B] { def call(): B = fn(a) }))
      futures.map { f =>
        try f.get()
        catch { case e: ExecutionException => throw e.getCause }
      }
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.HOURS)
    }
  }

  def foreach[A](items: Seq[A], parallelism: Int = DefaultParallelism)(fn: A => Unit): Unit = {
    map(items, parallelism)(fn); ()
  }
}
