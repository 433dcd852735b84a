package graft.operators

import org.apache.spark.sql.DataFrame

/** Diff-sync: the reference upserts every assembled source entity, then
  * deletes target records whose key never appeared in the source
  * (remove-as-you-go map at SisConnectorService.java:153,188; final sweep
  * :463-470). Equivalent set semantics, one distributed plan:
  *
  *   upserts = source                      (POST-as-upsert, retry-safe)
  *   deletes = target ⟕̸ source  (left_anti on the natural key)
  *
  * The anti-join broadcastable when the upsert key set is small; otherwise a
  * shuffled hash join — either way no driver-side key map, so the target
  * snapshot is not bounded by driver heap (the reference silently truncated
  * the snapshot at 100 rows — SisConnectorService.java:694).
  */
object SyncDiff {

  final case class SyncPlan(upserts: DataFrame, deletes: DataFrame)

  def plan(source: DataFrame, target: DataFrame, keyCols: Seq[String]): SyncPlan = {
    val deletes = target.join(source.select(keyCols.head, keyCols.tail: _*), keyCols, "left_anti")
    SyncPlan(upserts = source, deletes = deletes)
  }

  /** Invariant (property-tested): delete keys ∪ source keys ⊇ target keys,
    * and delete keys ∩ source keys = ∅.
    */
}
