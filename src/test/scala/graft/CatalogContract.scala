package graft

/** Single source of truth for the catalog's expected size (VERDICT r8
  * minor: the per-spec `>= N` floors went stale the moment the catalog
  * grew, so a silently-dropped entry could hide inside the slack).
  * Every catalog-walking spec asserts EXACT equality against this
  * constant: dropping an entry fails loudly, and ADDING one forces a
  * deliberate bump here — the bump is the reviewable record that the
  * catalog grew.
  */
object CatalogContract {
  val expectedSize: Int = 281
}
