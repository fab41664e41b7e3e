package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of [[SpanIndex]]'s candidate stage — exact-substring
  * span detection AT INGEST, completing the streaming near-dup family
  * (MinHash bands, image/video Hamming bands; StreamingSpec pins each
  * against its batch twin): documents explode to their anchor k-gram
  * hashes, `flatMapGroupsWithState` keyed by ANCHOR HASH holds the
  * `(doc_id, pos)` rows seen so far, and each arrival emits one
  * candidate per stored row sharing the hash — the same
  * `(id1, id2, pa, delta)` triples [[SpanIndex.ingestBatch]]'s probe
  * join produces, from which the consecutive-anchor span grouping
  * follows identically downstream.
  *
  * TWO caps together bound state at 100 TB, one per growth axis:
  * the DOCUMENT-FREQUENCY cap — an anchor whose distinct-doc count
  * crosses `maxDf` TOMBSTONES: its row list drops (state per hot
  * anchor collapses to a flag) and it never emits again, the
  * row-grain form of SpanIndex's monotone as-of-probe-time semantics
  * (already-emitted candidates stand; boilerplate stops amplifying) —
  * and the per-doc OCCURRENCE cap `maxOccPerDoc`: one document
  * repeating a k-gram thousands of times (generated spam, minified
  * markup) would otherwise grow a single anchor's state without ever
  * crossing the doc cap, each repeat emitting pairs against every
  * stored row; occurrences of a (anchor, doc) beyond the cap DROP
  * (never stored, never emitted — self-repetition past the cap adds
  * no dedup information; within-doc repetition is t11/dd17's signal,
  * not the cross-doc span index's). Together: per-anchor state
  * ≤ maxDf · maxOccPerDoc rows, hard.
  */
object SpanStream {

  final case class AnchorRow(h: String, doc_id: Long, pos: Long)
  final case class Cand(id1: Long, id2: Long, pa: Long, delta: Long)

  /** rows ≤ maxDf·maxOccPerDoc while live; `capped` tombstones the
    * anchor (rows dropped, emissions stop — monotone). */
  final case class AnchorState(rows: Seq[(Long, Long)], capped: Boolean)

  /** The k-gram anchor explode — [[SpanIndex.ingestBatch]]'s exact
    * hashing, factored for the stream side. */
  def anchors(docs: DataFrame, idCol: String, tokensCol: String,
              k: Int): DataFrame = {
    val w = col(tokensCol)
    docs.select(col(idCol).as("doc_id"), posexplode(
        when(size(w) >= k,
          transform(sequence(lit(0), size(w) - k),
            i => md5(concat_ws(" ", slice(w, i + 1, lit(k))))))
          .otherwise(array())))
      .toDF("doc_id", "pos", "h")
      .select(col("h"), col("doc_id"), col("pos").cast("long").as("pos"))
  }

  /** Streamed candidate pairs: each arriving anchor row pairs against
    * every stored row of its hash (and earlier rows of its own
    * micro-batch, id-then-pos ordered so within-batch emission is
    * deterministic). Same-doc collisions never emit, matching the
    * batch join's `a.doc_id < b.doc_id`; a doc's occurrences beyond
    * `maxOccPerDoc` drop row-wise (state stays ≤ maxDf·maxOccPerDoc
    * rows even under within-doc k-gram spam). */
  def candidates(rows: Dataset[AnchorRow], maxDf: Int,
                 maxOccPerDoc: Int = 16): Dataset[Cand] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[AnchorRow],
         st: org.apache.spark.sql.streaming.GroupState[AnchorState]) => {
          val prior = if (st.exists) st.get else AnchorState(Nil, false)
          if (prior.capped) {
            it.foreach(_ => ()) // drain; the anchor is dead
            Iterator.empty
          } else {
            val incoming = it.map(r => (r.doc_id, r.pos))
              .toSeq.distinct.sorted
            var acc = prior.rows
            val occ = scala.collection.mutable.Map.empty[Long, Int]
            prior.rows.foreach { case (id, _) =>
              occ(id) = occ.getOrElse(id, 0) + 1 }
            var docSet = prior.rows.map(_._1).toSet
            var capped = false
            val out = Seq.newBuilder[Cand]
            for ((id, pos) <- incoming if !capped) {
              if (!docSet.contains(id) && docSet.size + 1 > maxDf)
                capped = true
              else if (occ.getOrElse(id, 0) < maxOccPerDoc) {
                docSet += id
                occ(id) = occ.getOrElse(id, 0) + 1
                acc.foreach { case (oid, opos) =>
                  if (oid != id)
                    out += (if (oid < id) Cand(oid, id, opos, pos - opos)
                            else Cand(id, oid, pos, opos - pos))
                }
                acc = acc :+ ((id, pos))
              }
            }
            st.update(
              if (capped) AnchorState(Nil, capped = true)
              else AnchorState(acc, capped = false))
            out.result().iterator
          }
        })
  }
}
