package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped cache of persisted DataFrames (shared intermediate
  * results like the KNN ranked-neighbor set or the IVF assignment table).
  *
  * Hygiene guarantees (vs a bare TrieMap.getOrElseUpdate):
  *  - entries of a session are unpersisted and dropped when that session's
  *    application ends (SparkListenerApplicationEnd), so long-lived JVMs
  *    hosting many short sessions do not leak persisted state;
  *  - a racing first access builds twice but persists once: the loser of
  *    the putIfAbsent is unpersisted immediately and the winner is shared.
  */
final class PersistedCache {
  private val map = TrieMap.empty[(SparkSession, String), DataFrame]
  private val hooked = TrieMap.empty[SparkSession, Unit]

  def getOrBuild(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    map.get((s, key)) match {
      case Some(df) => df
      case None =>
        val df = build.persist()
        map.putIfAbsent((s, key), df) match {
          case Some(winner) => quietUnpersist(df); winner
          case None => hook(s); df
        }
    }

  /** Install the end-of-application eviction listener once per session. */
  private def hook(s: SparkSession): Unit =
    if (hooked.putIfAbsent(s, ()).isEmpty) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          evict(s)
          // the application is over — this session can never build again,
          // so dropping the marker here leaks nothing and releases the
          // last strong reference to the (now dead) session
          hooked.remove(s)
        }
      })
    }

  /** Drop (and unpersist) every entry belonging to one session. The
    * `hooked` marker is NOT dropped for a LIVE session: the listener
    * stays registered (it is idempotent), so repeated evict/build cycles
    * never stack up duplicate listeners; the marker is released only in
    * the application-end path above, where the session is dead. */
  def evict(s: SparkSession): Unit =
    map.keys.filter(_._1 eq s).foreach(k => map.remove(k).foreach(quietUnpersist))

  /** Drop every cached entry (tests / manual reset). Listeners stay —
    * see evict(). */
  def clear(): Unit =
    map.keys.toSeq.foreach(k => map.remove(k).foreach(quietUnpersist))

  // unpersist on a stopped session throws — eviction must stay silent
  private def quietUnpersist(df: DataFrame): Unit =
    try df.unpersist() catch { case _: Throwable => () }
}
