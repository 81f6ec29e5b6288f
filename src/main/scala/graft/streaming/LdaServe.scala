package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONLINE TRAIN→SERVE loop over the [[LdaProcessor]] model stream —
  * the piece that turns `q_lda_classifier`/`LdaProcessor` from a pair
  * of artifacts into a pipeline:
  *
  *   training events ──► LdaProcessor (transformWithState)
  *        │                   │  one (key, n, w1, w2, thr, flip, det)
  *        │                   ▼  row per key per micro-batch
  *        │             foreachBatch [[modelSink]] ──► [[ModelRegistry]]
  *        │                                                │ frozen
  *   scoring events ──► foreachBatch [[scoringSink]] ◄─────┘ snapshot
  *                            │
  *                            ▼ scored events (score, pred, model_n)
  *
  * Determinism contract (the frozen-reference discipline every
  * streaming twin here follows): each scoring micro-batch reads ONE
  * registry snapshot taken at batch start and scores every row with
  * it — scoring is stateless given the snapshot, so the scored set is
  * bit-identical under ANY batch split of the scoring stream. Model
  * EVOLUTION happens only between scoring batches (the standard
  * online-serving contract: never score an event with a model that
  * already saw it). Registry upserts keep the row with the LARGER
  * training mass `n` per key — training mass is monotone, so replayed
  * model batches after a sink retry are idempotent no-ops.
  *
  * Scale shape: model rows are metadata-sized (one per key), so the
  * sink collect is bounded; scoring joins the batch against a
  * BROADCAST literal of the snapshot — per-event work is one map
  * lookup + two multiplies, the same integer score/pred expressions
  * as `q_lda_classifier` (`w1·x1 + w2·x2` vs `thr`, flipped when the
  * class-1 projection sits below class 0).
  */
object LdaServe {

  final case class Model(n: Long, w1: Long, w2: Long, thr: Long,
      flip: Boolean, det: Long)

  /** Driver-side model registry: the serving surface the model stream
    * writes and scoring batches snapshot. (In a cluster deployment
    * this is a shared table/topic; the contract — monotone-mass
    * upsert, frozen per-batch snapshot — is the part that matters.)
    */
  final class ModelRegistry {
    private val m = new java.util.concurrent.ConcurrentHashMap[String, Model]()
    def upsert(key: String, model: Model): Unit =
      m.merge(key, model, (old, nw) => if (nw.n >= old.n) nw else old)
    def snapshot: Map[String, Model] = {
      val b = Map.newBuilder[String, Model]
      m.forEach((k, v) => b += k -> v)
      b.result()
    }
  }

  /** foreachBatch sink for the [[LdaProcessor]] output stream (columns
    * k, n, w1_milli, w2_milli, thr, flip, det_q): upsert every emitted
    * model into the registry. One row per key per batch — the collect
    * is model-sized, never data-sized.
    */
  def modelSink(reg: ModelRegistry)(batch: DataFrame, batchId: Long): Unit =
    batch.select("k", "n", "w1_milli", "w2_milli", "thr", "flip", "det_q")
      .collect().foreach { r =>
        reg.upsert(r.getString(0), Model(r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5), r.getLong(6)))
      }

  /** Score (k, x1, x2) rows against a FROZEN snapshot — stateless, so
    * batch-split-invariant. Keys without a model yet are DROPPED
    * (cold start: nothing to serve) — also deterministic. Identical
    * integer score/pred semantics to `q_lda_classifier`.
    */
  def score(rows: DataFrame, snap: Map[String, Model]): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val mdf = snap.toSeq.sortBy(_._1)
      .map { case (k, m) => (k, m.n, m.w1, m.w2, m.thr, m.flip) }
      .toDF("k", "model_n", "w1_milli", "w2_milli", "thr", "flip")
    rows.join(broadcast(mdf), Seq("k"))
      .withColumn("score", expr("w1_milli * x1 + w2_milli * x2"))
      .withColumn("pred", expr("CASE WHEN flip THEN score < thr ELSE score > thr END"))
      .select("k", "x1", "x2", "score", "pred", "model_n")
  }

  /** foreachBatch scorer: snapshot once at batch start, score, hand
    * the scored rows to `emit` (a sink adapter — memory queue in
    * tests, a writer in deployments).
    */
  def scoringSink(reg: ModelRegistry)(
      emit: Iterator[(String, Long, Long, Long, Boolean, Long)] => Unit)(
      batch: DataFrame, batchId: Long): Unit = {
    val snap = reg.snapshot // frozen for the whole batch
    emit(score(batch, snap).collect().iterator.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5))))
  }
}
