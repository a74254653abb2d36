package graft.sources.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A metadata table (`<cat>.<t>.history`, `<cat>.<t>.files`): the
  * wrapped thunk computes a manifest-sized DataFrame on the DRIVER (no
  * data file opened), served to SQL as a [[LocalScan]] — the plan is a
  * LocalTableScan, zero tasks, recomputed per query so a new commit is
  * visible to the next read. Metadata tables are read-only by
  * construction (no write capabilities declared). */
private[v2] class SnapshotMetaTable(ident: String, compute: () => DataFrame)
  extends Table with SupportsRead {

  override def name(): String = ident
  // the schema is static per table kind, but analysis asks for it
  // several times — compute it once; build() still recomputes ROWS per
  // query so new commits stay visible
  private lazy val staticSchema: StructType = compute().schema
  override def schema(): StructType = staticSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        private val df = compute()
        override def rows(): Array[InternalRow] =
          df.queryExecution.executedPlan.executeCollect()
        override def readSchema(): StructType = df.schema
        override def description(): String = ident
      }
    }
}
