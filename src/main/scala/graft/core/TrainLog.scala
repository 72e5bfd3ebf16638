package graft.core

/** Per-process record of artifact TRAINING seconds (r17 — the r16
  * verdict's train/serve-split item): the per-(process, sf dir)
  * persisted artifacts (posting index, LSH segments, coarse/PQ
  * codebooks, BPE merges) are built by their FIRST caller and read back
  * by every later one, so a min-of-passes bench entry reports the warm
  * SERVING cost while the first pass silently absorbed the training.
  * Recording the build seconds here — and emitting them in the bench
  * JSON (`artifact_train_sec`) — makes that split machine-readable
  * instead of something a reader must reconstruct from pass spreads.
  *
  * Keys are the artifact families' builtOnce lockTags; seconds ACCUMULATE
  * per tag (a family may build several artifacts per process, e.g. the
  * fixed-k and scaled-k quantizers both under "centroids").
  */
object TrainLog {
  private val secs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def record(tag: String, sec: Double): Unit =
    secs.merge(tag, java.lang.Double.valueOf(sec),
      (a, b) => java.lang.Double.valueOf(a.doubleValue + b.doubleValue))

  /** snapshot, sorted by tag for deterministic JSON emission */
  def snapshot: Seq[(String, Double)] = {
    val it = secs.entrySet().iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    while (it.hasNext) { val e = it.next(); buf += e.getKey -> e.getValue.doubleValue }
    buf.sortBy(_._1).toSeq
  }

  def totalSec: Double = snapshot.map(_._2).sum
}
