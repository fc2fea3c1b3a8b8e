package graft

import java.sql.Timestamp

/** Case-class schemas for the fixture star entities (SURVEY.md §1.5):
  * `Dataset[T]` gives compile-time field access where the reference used
  * fragile positional tuples (`row[8]`, warehouse.py:140). Field names
  * match the parquet columns so `df.as[T]` binds by name.
  */
object Schemas {
  final case class Region(r_regionkey: Int, r_name: String)
  final case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                            c_acctbal: Double, c_mktsegment: String)
  final case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
                            s_acctbal: Double)
  final case class Part(p_partkey: Long, p_name: String, p_brand: String,
                        p_type: String, p_size: Int, p_retailprice: Double)
  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                         o_totalprice: Double, o_orderdate: Timestamp,
                         o_orderpriority: String)
  final case class LineItem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                            l_linenumber: Int, l_quantity: Double,
                            l_extendedprice: Double, l_discount: Double,
                            l_tax: Double, l_returnflag: String,
                            l_linestatus: String, l_shipdate: Timestamp)
  final case class Document(doc_id: Long, text: String, lang: String,
                            source: String, n_chars: Long)
}
