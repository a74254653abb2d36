package graft.core

/** Overlap two INDEPENDENT driver-side actions (optimization guide
  * §2.6): Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because the driver calls
  * them sequentially. Snapshot fixtures that build two separate tables
  * (two commits, two re-layout CALLs) pay each build's straggler tail
  * and driver-side commit latency back to back; running the pair on two
  * driver threads back-fills the idle task slots with the other build's
  * jobs. Correctness is untouched: the two thunks share no table, each
  * publishes through its own CAS loop, and job-group/description
  * properties are InheritableThreadLocal (the spawned thread clones the
  * caller's at creation, so UI labels stay right).
  *
  * The second thunk runs on a fresh thread, the first on the caller —
  * no pool to shut down, and the caller does half the work. Either
  * side's exception propagates after both finish. */
object Par {
  def both[A, B](a: => A, b: => B): (A, B) = {
    var bOut: Either[Throwable, B] = null
    val t = new Thread(() =>
      bOut = try Right(b) catch { case e: Throwable => Left(e) })
    t.setName(s"graft-par-${t.getId}")
    t.setDaemon(true)
    t.start()
    val aOut = try a finally t.join()
    bOut match {
      case Right(v) => (aOut, v)
      case Left(e)  => throw e
    }
  }

  /** [[both]] for same-typed side-effecting setup steps. */
  def pair(a: => Unit, b: => Unit): Unit = { both(a, b); () }
}
