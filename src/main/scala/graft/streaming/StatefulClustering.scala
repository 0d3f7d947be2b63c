package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * ST4 alternative: online story assignment with the story state held in
 * Spark's STATE STORE (`flatMapGroupsWithState`) instead of re-read from
 * the stories table each batch ([[OnlineClustering.processBatch]]).
 *
 * All records map to one logical group — the same total order the
 * reference's single Kafka consumer imposes (duplication_service.py:
 * 152-168); the state survives restarts via the checkpoint, so recovery
 * needs no table re-hydration. Featurization upstream and sinks
 * downstream remain fully distributed; only the (id, vec) pairs of one
 * trigger's batch pass through the sequential fold.
 *
 * Trade-off vs the foreachBatch form: state-store persistence and
 * exactly-once replay come for free, but the stories table is written as
 * a downstream projection of the assignment stream rather than
 * merge-updated in place. Both forms share [[OnlineClustering.foldBatch]]
 * for the order-dependent semantics.
 *
 * STATE CAP — this variant is the small/medium-corpus form. All story
 * state serializes as ONE state-store value (single group), deserialized
 * and re-serialized every trigger: practical to roughly 10^5 stories
 * (≈ a few hundred MB at 384-dim centroids), a wall beyond that. It
 * cannot shard without giving up the reference's total-order guarantee
 * (a story created in shard A must be joinable by the very next record,
 * which may hash to shard B — any cross-shard merge reintroduces exactly
 * the sequential dependency being sharded away). At corpus scale use
 * [[OnlineClustering.processBatchPruned]] in foreachBatch: story state
 * lives in the (distributed, MERGE-updated) stories table and only the
 * batch's grid-cell candidates are ever materialized on the driver.
 */
object StatefulClustering {

  /** @param incoming (id, vec) stream; @return assignment stream */
  def assignStream(incoming: Dataset[Incoming], threshold: Double): Dataset[Assigned] = {
    implicit val encA = Encoders.product[Assigned]
    implicit val encState = Encoders.kryo[Seq[StoryState]]
    implicit val encKey = Encoders.scalaInt
    incoming
      .groupByKey(_ => 0)(Encoders.scalaInt)
      .flatMapGroupsWithState[Seq[StoryState], Assigned](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, records: Iterator[Incoming], state: GroupState[Seq[StoryState]]) =>
          val stories = state.getOption.getOrElse(Seq.empty)
          val epoch = state.getOption.map(_.length.toLong).getOrElse(0L)
          val (assigned, newState) = OnlineClustering.foldBatch(
            records.toSeq, stories, threshold,
            i => s"story-${epoch}-$i")
          state.update(newState)
          assigned.iterator
      }
  }
}
