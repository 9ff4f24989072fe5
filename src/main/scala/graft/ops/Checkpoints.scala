package graft.ops

import org.apache.spark.sql.DataFrame

/** Block-lifecycle control for `localCheckpoint`-truncated iterative
  * lineages (the per-round convention of [[Graph]], [[Bpe]] and the
  * maintained-index rebuild).
  */
object Checkpoints {

  /** Free an INTERMEDIATE round's `localCheckpoint` blocks once its
    * successor is materialized. `Dataset.unpersist()` is a silent no-op on
    * a checkpointed frame — the blocks belong to the internal RDD, which
    * the cache manager does not own — so without this every
    * power-iteration round retained its materialized vector for the life
    * of the session: the ×100 scale probe measured the graph family
    * peaking at 62–68 GB heap from exactly that (BASELINE.md §r16). Only
    * ever call it on a frame whose successor is already materialized and
    * no longer references it; the FINAL returned frame keeps its blocks (a
    * localCheckpoint severs lineage, so they are its only copy and an
    * unpersisted one cannot be recomputed).
    */
  private[graft] def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
