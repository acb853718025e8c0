package graft.streaming

/** The pager seam for s30's streaming recall alert: each maintenance
  * micro-batch posts its alert row here the moment the batch's index
  * appends commit, so a rebuild scheduler subscribes to a push signal
  * instead of polling the batch monitor (e20). A `Dataset.observe` metric
  * cannot carry this value — observed metrics aggregate the STREAMED
  * batch's own rows, while mean recall is an aggregate over the standing
  * index tables (a different dataset) — so the delivery point is the
  * foreachBatch commit, the same point `StreamingQueryListener` progress
  * becomes visible. The durable form of the same log is the alert table
  * s30's oracle replays; this bus is the in-process wire.
  */
object RecallAlertBus {
  final case class Alert(
      nSeen: Long, nQueries: Long, meanRecall: Double,
      minRecall: Double, nBelowFloor: Long, alert: Boolean)

  private val q = new java.util.concurrent.ConcurrentLinkedQueue[Alert]()

  def post(a: Alert): Unit = q.add(a)

  /** Remove and return everything posted so far, in post order. */
  def drain(): Seq[Alert] = {
    val b = Seq.newBuilder[Alert]
    var x = q.poll()
    while (x != null) { b += x; x = q.poll() }
    b.result()
  }
}
