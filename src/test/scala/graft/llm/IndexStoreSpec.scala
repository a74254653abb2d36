package graft.llm

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** The crash-safe build-once contract of [[IndexStore]]: a directory
  * without the completion marker — including a half-written one — reads
  * as absent and is rebuilt from scratch; a marked one is never rebuilt;
  * the fingerprint changes when (and only when) the source data does. */
class IndexStoreSpec extends SparkTestBase {

  test("ensure builds once, skips when marked, rebuilds a half-written dir") {
    val dir = Files.createTempDirectory("idxstore").toString + "/idx"
    var builds = 0
    assert(IndexStore.ensure(spark, dir) { builds += 1 })
    assert(builds == 1)
    assert(!IndexStore.ensure(spark, dir) { builds += 1 }) // marked → skip
    assert(builds == 1)
    // simulate a crash mid-save: marker gone, stale partial file present
    Files.delete(Paths.get(dir, "_GRAFT_INDEX_COMPLETE"))
    Files.write(Paths.get(dir, "partial.parquet"), Array[Byte](1, 2, 3))
    assert(IndexStore.ensure(spark, dir) { builds += 1 }) // rebuilt
    assert(builds == 2)
    // the rebuild wiped the unmarked leftovers before building
    assert(!Files.exists(Paths.get(dir, "partial.parquet")))
  }

  test("fingerprint is stable for unchanged data, moves when data changes") {
    val data = Files.createTempDirectory("idxdata")
    Files.write(data.resolve("a.parquet"), "aaa".getBytes)
    val f1 = IndexStore.fingerprint(spark, data.toString)
    assert(f1 == IndexStore.fingerprint(spark, data.toString))
    Files.write(data.resolve("a.parquet"), "aaaa".getBytes) // new length
    assert(f1 != IndexStore.fingerprint(spark, data.toString))
  }
}
