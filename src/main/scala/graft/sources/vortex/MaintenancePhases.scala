package graft.sources.vortex

/** Opt-in phase timer for the maintenance-DML decomposition probes
  * (r15, VERDICT r14 next #2): set `GRAFT_PHASES=1` (env) or
  * `-Dgraft.phases` and every wrapped block prints one
  * `[phase] <statement>.<name> <sec>` line to stderr. Zero overhead
  * when off (a plain call-through); never enabled in bench/verify. */
private[graft] object MaintenancePhases {
  val enabled: Boolean =
    sys.env.contains("GRAFT_PHASES") || sys.props.contains("graft.phases")
  def apply[T](name: String)(body: => T): T =
    if (!enabled) body
    else {
      val t0 = System.nanoTime()
      try body
      finally System.err.println(
        f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
}
