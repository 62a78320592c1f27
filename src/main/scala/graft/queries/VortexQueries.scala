package graft.queries

/** SURVEY.md §2.1 S1–S4: queries over the custom `vortex` DataSource
  * (write → read round trips). Oracles run on the original parquet
  * tables — round-trip identity makes them equivalent. Populated as
  * the DataSource lands (M3–M5).
  */
object VortexQueries {
  val set = new QuerySet
}
