package graft.operators

/** Construction-time concurrency for independent operator chains
  * (guide §2.6 "overlap independent jobs").
  *
  * Several panel queries are unions of INDEPENDENT deterministic
  * chains (the three tokenizer train+encode chains, the dedup recall
  * panel's truth/minhash/simhash relations, the ANN recall panel's
  * index builds). Each chain contains eager materializations
  * (localCheckpoint-per-round trainers, count-gated broadcasts), so
  * building them one after another serializes many small jobs on an
  * idle cluster — the driver waits on each round's tail while every
  * other chain's work could be back-filling the executors. Submitting
  * the chain constructions from a small driver thread pool overlaps
  * them; Spark's FIFO scheduler interleaves the jobs and the wall
  * clock drops toward the longest single chain.
  *
  * Correctness: each chain is a pure deterministic function of its
  * input relation — no shared mutable state, no run-order dependence —
  * so the union is bit-identical to the sequential build (the specs
  * and the DuckDB oracle pin this). Failures propagate: the first
  * chain exception rethrows at the await.
  */
object Par {
  /** Run the thunks concurrently on a bounded pool, return results in
    * input order. The pool is per-call and torn down before return —
    * no shared executor state between queries.
    */
  def seq[A](thunks: Seq[() => A]): Seq[A] = {
    if (thunks.sizeIs <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(thunks.size, 4))
    try {
      import scala.jdk.CollectionConverters._
      val futures = thunks.map(t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          override def call(): A = t()
        }))
      // get() rethrows the chain's exception wrapped; unwrap one level
      // so callers see the original error type
      futures.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }

  def two[A, B](a: () => A, b: () => B): (A, B) = {
    val r = seq(Seq(() => a().asInstanceOf[AnyRef], () => b().asInstanceOf[AnyRef]))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
