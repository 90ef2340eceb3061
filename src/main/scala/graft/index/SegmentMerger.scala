package graft.index

import graft.codec.{DecodedPosting, PostingCodec}

/** Merge adjacent posting runs of the same term into compacted runs — the
  * segment-merge analog of Lucene's background merges + final commit
  * (`IndexTREC.java:98-101`). Because initial runs are keyed by
  * docid-range group, runs of one term arrive docid-disjoint and ordered,
  * so merging is a streaming concatenation (decode → re-encode to restore
  * delta continuity), never a re-sort.
  */
object SegmentMerger {

  /** Input: (run, mergedGroup) pairs sorted by (term, grp) within the
    * partition, with all runs of a (term, mergedGroup) co-located
    * (guaranteed by the repartition in [[IndexBuilder]]); mergedGroup comes
    * from the global sorted-grp rank map, so adjacent docid ranges merge
    * even across the build's range partitions. Output: one run per
    * (term, merged group), `grp` rewritten to the merged id, bucket
    * preserved.
    */
  def mergeSorted(it: Iterator[(PostingRun, Long)]): Iterator[PostingRun] = {
    val rows = it.buffered
    new Iterator[PostingRun] {
      def hasNext: Boolean = rows.hasNext
      def next(): PostingRun = {
        val (head, mgrp) = rows.head
        val term = head.term
        val bucket = head.bucket
        val chunkRuns = new Iterator[PostingRun] {
          def hasNext: Boolean =
            rows.hasNext && rows.head._1.term == term && rows.head._2 == mgrp
          def next(): PostingRun = rows.next()._1
        }
        val e = PostingCodec.encode(chunkRuns.flatMap(decode))
        PostingRun(term, bucket, mgrp, e.ndocs, e.firstDocid, e.lastDocid,
          e.maxTf, e.sumTf, e.docBlob, e.tfBlob, e.dlBlob, e.posBlob,
          e.blockLastDocid, e.blockMaxTf, e.blockMinDl,
          e.blockDocOff, e.blockTfOff, e.blockDlOff, e.blockPosOff)
      }
    }
  }

  /** Decode one run's postings (streaming; positions carried when stored). */
  def decode(r: PostingRun): Iterator[DecodedPosting] =
    PostingCodec.decodeBlobs(r.ndocs, r.doc_blob, r.tf_blob, r.dl_blob, r.pos_blob)
}
