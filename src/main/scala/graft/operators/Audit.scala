package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cap-drop observability, unified. Every pair-stage guard in the
  * dedup/linkage families trades recall for boundedness by discarding
  * oversized groups BEFORE expansion ([[Dedup.minhashCandidates]]'
  * `maxBucket`, [[Fuzzy]]'s `maxBlock`); each cap has its own
  * monitoring twin ([[Dedup.droppedBuckets]],
  * [[Fuzzy.droppedBlocks]]), but a production run needs ONE place to
  * see everything the caps discarded — this is that surface. */
object Audit {

  /** Union of the dedup, fuzzy, and (optionally) embedding-space
    * dropped-mass reports, normalized to (family, drop_key, n_members):
    *  - `minhash_bucket` rows: LSH band buckets with more than
    *    `maxBucket` docs (keyed "band:band_hash"), from the corpus the
    *    near-dup pass runs on;
    *  - `fuzzy_block` rows: blocking keys with more than `maxBlock`
    *    distinct names, from the linkage dictionary;
    *  - `semantic_cell` rows (when `semanticEmb` is given): k-means
    *    cells with more than `maxCell` vectors — the cells
    *    [[Clustering.semanticDedup]]'s cap excludes from its pair
    *    stage;
    *  - `two_level_cell` rows (when `twoLevelEmb` is given): combined
    *    two-level-quantizer cells over `maxCellTwoLevel`, the cells
    *    [[Clustering.semanticDedupTwoLevel]]'s cap excludes.
    * Every input is an already-bounded aggregate (dropped groups
    * only), so the union is audit-sized — a log line or a quarantine
    * table, never a second fact. */
  def dropAudit(minhashDocs: DataFrame, maxBucket: Int,
                fuzzyNames: DataFrame, nameCol: String,
                maxBlock: Int,
                semanticEmb: Option[DataFrame] = None,
                kCells: Int = 8, maxCell: Int = 0,
                twoLevelEmb: Option[DataFrame] = None,
                k1: Int = 4, k2: Int = 4, maxCellTwoLevel: Int = 0): DataFrame = {
    // the cap defaults (0) are only valid when the frame they gate is
    // absent — fail at THIS boundary with the parameter named, not as
    // a bare require deep inside droppedCells*
    require(semanticEmb.isEmpty || maxCell > 0,
      "dropAudit: semanticEmb given but maxCell is not positive — " +
        "pass the semanticDedup cap being audited (e.g. maxCell = 1024)")
    require(twoLevelEmb.isEmpty || maxCellTwoLevel > 0,
      "dropAudit: twoLevelEmb given but maxCellTwoLevel is not positive — " +
        "pass the semanticDedupTwoLevel cap being audited (e.g. maxCellTwoLevel = 40)")
    val buckets = Dedup.droppedBuckets(minhashDocs, maxBucket = maxBucket)
      .select(lit("minhash_bucket").as("family"),
        concat(col("band").cast("string"), lit(":"),
          col("band_hash").cast("string")).as("drop_key"),
        col("n_docs").cast("long").as("n_members"))
    val blocks = Fuzzy.droppedBlocks(fuzzyNames, nameCol, maxBlock)
      .select(lit("fuzzy_block").as("family"),
        col("block_key").as("drop_key"),
        col("n_members").cast("long").as("n_members"))
    val cells = semanticEmb.map { emb =>
      Clustering.droppedCells(emb, kCells, maxCell)
        .select(lit("semantic_cell").as("family"),
          col("cell").cast("string").as("drop_key"),
          col("n_members").cast("long").as("n_members"))
    }
    val tlCells = twoLevelEmb.map { emb =>
      Clustering.droppedCellsTwoLevel(emb, k1, k2, maxCellTwoLevel)
        .select(lit("two_level_cell").as("family"),
          col("cell").cast("string").as("drop_key"),
          col("n_members").cast("long").as("n_members"))
    }
    (cells ++ tlCells).foldLeft(buckets.unionByName(blocks))(_.unionByName(_))
      .orderBy(col("family"), col("drop_key"))
  }
}
