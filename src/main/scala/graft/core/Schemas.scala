package graft.core

import java.time.LocalDateTime
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed table surface (SURVEY.md §1.2: user `Writable` product structs →
  * case-class `Dataset[T]`). The DataFrame loaders in [[Tables]] stay the
  * primary surface (codegen'd, no deserialization); these typed views are
  * for pipelines that want compile-time schemas — the analog of the
  * reference's class-per-job type configuration, but checked by scalac
  * instead of at runtime.
  */
object Schemas {

  final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: LocalDateTime)

  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: LocalDateTime, o_orderpriority: String)

  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  final case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
      s_acctbal: Double)

  final case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)

  final case class Event(event_id: Long, ts: LocalDateTime, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def lineitem(s: SparkSession, d: String): Dataset[Lineitem] = {
    import s.implicits._; Tables.lineitem(s, d).as[Lineitem]
  }
  def orders(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._; Tables.orders(s, d).as[Order]
  }
  def customer(s: SparkSession, d: String): Dataset[Customer] = {
    import s.implicits._; Tables.customer(s, d).as[Customer]
  }
  def supplier(s: SparkSession, d: String): Dataset[Supplier] = {
    import s.implicits._; Tables.supplier(s, d).as[Supplier]
  }
  def nation(s: SparkSession, d: String): Dataset[Nation] = {
    import s.implicits._; Tables.nation(s, d).as[Nation]
  }
  def events(s: SparkSession, d: String): Dataset[Event] = {
    import s.implicits._; Tables.events(s, d).as[Event]
  }
  def documents(s: SparkSession, d: String): Dataset[Document] = {
    import s.implicits._; Tables.documents(s, d).as[Document]
  }
  def embeddings(s: SparkSession, d: String): Dataset[Embedding] = {
    import s.implicits._; Tables.embeddings(s, d).as[Embedding]
  }
}
