package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: quality filter → exact dedup →
  * deterministic sample → sequence packing, composed from the individual
  * kernels in this package. One call takes a raw documents frame to
  * packed context-window assignments.
  *
  * Every stage is a pure function of the data (Gopher ratios, content
  * digests, salted-hash sampling, id-ordered next-fit), so the whole
  * pipeline is reproducible across reruns, retries, and repartitionings —
  * at 100 TB an executor loss mid-job must not change which documents
  * reach training. Stage costs: the filter is a map + one bounded
  * per-(doc,word) shuffle, dedup is one digest-keyed shuffle with
  * map-side combine, sampling is a scan-level filter, packing shuffles
  * once on the bucket key. Nothing is corpus-global except the digest
  * group-by, and its state is one row per distinct content.
  */
object Pipeline {

  /** Run the full preparation. Returns (id, bucket, bin, n) — the packed
    * assignment of every surviving document. */
  def prepareCorpus(docs: DataFrame, idCol: String, textCol: String,
                    sampleHex: String, capacity: Long = 200L,
                    buckets: Int = 32): Dataset[Packing.PackAssign] = {
    val quality = Cleaning.repetitionStats(docs, idCol, textCol)
      .filter(col("keep")).select(col("id"))
    val qualified = docs.join(quality, docs(idCol) === quality("id"), "left_semi")
    // exact dedup: a doc survives iff it is the smallest id of its digest
    val keeper = qualified
      .select(col(idCol).as("kid"), md5(lower(col(textCol))).as("digest"))
      .groupBy(col("digest")).agg(min(col("kid")).as("kid"))
    val deduped = qualified.join(keeper,
      qualified(idCol) === keeper("kid"), "left_semi")
    val sampled = Sampling.hashSample(deduped, idCol, sampleHex)
    Packing.nextFitPack(sampled, idCol, textCol, capacity, buckets)
  }
}
