package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Single-customer history fetch — `GET /v1/query/{table}/customer?id=`
  * (`src/rpc_query.cpp:1253-1383`, `src/grid.cpp:230-392` toJSON): the
  * customer's events in time order as a JSON document, set-typed properties
  * expanded as arrays, nulls omitted.
  *
  * The scan stays distributed and filter-pushed (EqualTo on the id reaches
  * the parquet scan); only the one customer's rows are collected.
  */
object Customers {

  def history(events: DataFrame, id: Any): DataFrame =
    events.where(col("id") === lit(id)).orderBy(col("stamp"))

  def historyJson(events: DataFrame, id: Any): String = {
    val rows = history(events, id).collect()
    val fields = if (rows.isEmpty) Array.empty[String]
      else rows.head.schema.fieldNames
    val sb = new StringBuilder
    sb.append("{\"id\":").append(jsonVal(id)).append(",\"events\":[")
    var first = true
    rows.foreach { r =>
      if (!first) sb.append(",")
      first = false
      sb.append("{")
      var firstF = true
      fields.zipWithIndex.foreach { case (f, i) =>
        if (f != "id" && !r.isNullAt(i)) {
          if (!firstF) sb.append(",")
          firstF = false
          sb.append("\"").append(f).append("\":").append(jsonVal(r.get(i)))
        }
      }
      sb.append("}")
    }
    sb.append("]}")
    sb.toString
  }

  private def jsonVal(a: Any): String = a match {
    case null => "null"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case b: Boolean => b.toString
    case seq: scala.collection.Seq[_] => seq.map(jsonVal).mkString("[", ",", "]")
    case d: Double => if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case other => other.toString
  }
}
