package graft.io

/** FAULT-POINT HARNESS — the crash-injection hooks the swap-commit
  * machinery is audited through (the fail-point pattern databases use:
  * etcd/TiKV gofail, SQLite's test VFS). Every multi-step commit
  * protocol in the engine (table swap, snapshot create/restore, repair
  * swap, partition maintenance, artifact commit) declares a named
  * point BETWEEN each pair of steps; a spec arms a point, runs the
  * operation, and the protocol dies exactly there — then the spec
  * asserts the documented recovery (reader preambles, fsck
  * convergence, re-run idempotence) heals the store.
  *
  * Production cost: one `isEmpty` check on a never-populated set per
  * point — no reflection, no config, nothing to disable. Points fire
  * AT MOST ONCE per arm (auto-disarm) so a multi-table transaction
  * crashes at its FIRST step occurrence, the worst case, and the
  * recovery run sails through the same code path.
  */
object Faults {

  /** Thrown by an armed point — deliberately NOT an Exception subtype
    * catches like `case _: IOException` would swallow; protocols must
    * let a crash propagate, exactly like a kill -9 at that line.
    */
  final class InjectedCrash(val point: String)
      extends RuntimeException(s"injected crash at $point")

  private val armed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val hooks =
    new java.util.concurrent.ConcurrentHashMap[String, () => Unit]()

  /** Declare a crash point. No-op (two map-emptiness checks) unless a
    * spec armed or hooked exactly this name.
    */
  def point(name: String): Unit = {
    if (!armed.isEmpty && armed.remove(name)) throw new InjectedCrash(name)
    if (!hooks.isEmpty) {
      val h = hooks.remove(name)
      if (h != null) h()
    }
  }

  /** Arm `name` to crash on its next occurrence. Test-only. */
  def arm(name: String): Unit = armed.add(name)

  /** Run `body` once when `name` is next reached — the RACE twin of
    * [[arm]]: instead of dying at the point, the operation pauses on
    * its own thread while a concurrent actor's work (a rollback, an
    * ingest) lands, then continues — deterministic interleaving for
    * race specs, no sleeps or real threads. Auto-removes after
    * firing, like [[arm]]. Test-only.
    */
  def hookOnce(name: String)(body: => Unit): Unit =
    hooks.put(name, () => body)

  /** Disarm everything (spec cleanup). */
  def reset(): Unit = { armed.clear(); hooks.clear() }
}
