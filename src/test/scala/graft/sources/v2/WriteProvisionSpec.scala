package graft.sources.v2

import org.apache.spark.sql.types.{LongType, StructType}

import graft.SparkTestBase
import graft.ops.BucketLayout

/** The routed SQL INSERT's Exchange over-provision policy
  * ([[SnapshotBucketedWrite.requiredNumPartitions]]): 4x while the
  * write fits in ≤ 8 task waves of the cluster's cores (hash collisions
  * between bucket vectors and tasks extend the makespan only in the
  * few-wave regime), 1:1 beyond (many waves amortize collisions; floods
  * of empty tasks would cost more than they save). The threshold is
  * `max(1024, 8 × defaultParallelism)` — a 4096-bucket layout
  * over-provisions on a 4000-core cluster where its ingest is one wave,
  * and stays 1:1 on this box where 100+ waves already amortize. */
class WriteProvisionSpec extends SparkTestBase {

  private def partitionsFor(buckets: Int): Int =
    new SnapshotBucketedWrite(spark, "/tmp/graft-test/provision",
      new StructType().add("k", LongType),
      BucketLayout.Spec(Seq("k"), Seq(buckets)), _ => 1L)
      .requiredNumPartitions()

  test("over-provision threshold scales with cores, floor 1024, 1:1 beyond") {
    val cores = spark.sparkContext.defaultParallelism
    val threshold = math.max(1024, 8 * cores)
    // inside the threshold: 4x
    assert(partitionsFor(8) == 32)
    assert(partitionsFor(1024) == 4096)
    assert(partitionsFor(threshold) == math.min(threshold * 4, 65536))
    // beyond it: 1:1 (this box's cores keep the floor at 1024)
    assert(partitionsFor(threshold + 1) == threshold + 1)
    assert(partitionsFor(100000) == 100000)
  }
}
