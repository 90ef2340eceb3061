package graft

import graft.search.LuceneNorms

/** Generated `dl → lossy norm` lookup CTE for the DuckDB oracles of the
  * Lucene 5.4 stock similarities (q_bm25l/classicl/lmd/dfrl/ibl_topk).
  *
  * The stock models read doc length through Lucene's 1-byte norm
  * (boost/√dl packed by SmallFloat315): `lossy_dl` = decode(encode(1/√dl))⁻²
  * and `inv_sqrt` = decode(encode(1/√dl)) — see
  * [[graft.search.LuceneNorms]]. The quantization is the published
  * SmallFloat315 scheme; every row of this table is validated by an
  * INDEPENDENT mathematical reimplementation (truncate the float to 3
  * significant bits via exponent/mantissa arithmetic, no bit fiddling) in
  * CodecSpec — the same generated-SQL-with-independent-cross-check
  * standard as [[PorterSql]].
  *
  * Values print via Double.toString (shortest round-trip decimal), so
  * DuckDB parses back the exact float-widened-to-double value. Docs longer
  * than [[MaxDl]] tokens would DROP from the oracle's norm join and fail
  * the row-count compare loudly rather than silently mis-score.
  */
object LuceneNormSql {
  val MaxDl = 4096

  lazy val cte: String = {
    val rows = (1 to MaxDl).map { dl =>
      s"($dl,${LuceneNorms.lossyDl(dl).toDouble},${LuceneNorms.lossyInvSqrt(dl).toDouble})"
    }.grouped(8).map(_.mkString(",")).mkString(",\n")
    s"lnorm(dl, lossy_dl, inv_sqrt) AS (VALUES\n$rows)"
  }
}
