package graft.ops

import org.apache.spark.sql.{Column, Dataset, Encoder}

/** Group-at-a-time processing with sorted values — the reference's
  * secondary-sort contract (SURVEY.md §2.4, §7.4): partition by the
  * natural key (`EX/SecondarySort.java:145` FirstPartitioner), values
  * arrive at the reducer sorted by the secondary key
  * (`setSortComparatorClass :165`), group boundaries by natural key only
  * (`FirstGroupingComparator :133`).
  *
  * Spark mapping: `groupByKey(naturalKey).flatMapSortedGroups(sortCols)`
  * — the shuffle sorts (key, sortCols) in one pass exactly like the
  * reference's shuffle, and the function receives a STREAMING iterator in
  * sorted order (state must stay bounded for giant groups; the
  * reference's mark()/reset() BackupStore ≙ caller-side buffering of the
  * window it actually needs).
  */
object GroupSort {

  def sortedGroups[K: Encoder, T, U: Encoder](ds: Dataset[T])(key: T => K)(
      sortCols: Column*)(f: (K, Iterator[T]) => IterableOnce[U]): Dataset[U] =
    ds.groupByKey(key).flatMapSortedGroups(sortCols: _*)(f)
}
