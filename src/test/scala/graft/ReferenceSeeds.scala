package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Test-side parser for the reference's PostgreSQL seed data
  * (/root/reference/init-scripts/postgres/init.sql) — the master-data
  * fixture source for golden-parity tests. Parses INSERT tuples (tracking
  * quotes and nested parens, e.g. NOW()); BIGSERIAL ids are assigned by
  * insertion order exactly as PostgreSQL would.
  */
object ReferenceSeeds {

  sealed trait V
  case class S(s: String) extends V
  case class N(n: BigDecimal) extends V
  case class B(b: Boolean) extends V
  case object Null extends V

  /** Strip `--` line comments (quote-aware; comment text may contain
    * parens that would otherwise read as tuples). */
  def stripComments(sql: String): String =
    sql.linesIterator.map { line =>
      var inQuote = false
      var cut = -1
      var i = 0
      while (cut < 0 && i < line.length - 1) {
        if (line(i) == '\'') inQuote = !inQuote
        else if (!inQuote && line(i) == '-' && line(i + 1) == '-') cut = i
        i += 1
      }
      if (cut >= 0) line.substring(0, cut) else line
    }.mkString("\n")

  /** All tuples of `INSERT INTO <table> (...) VALUES ...;` */
  def tuples(rawSql: String, table: String): Seq[Seq[V]] = {
    val sql = stripComments(rawSql)
    val start = sql.indexOf(s"INSERT INTO $table ")
    require(start >= 0, s"no INSERT for $table")
    val valuesIdx = sql.indexOf("VALUES", start)
    val end = sql.indexOf(";", valuesIdx)
    val body = sql.substring(valuesIdx + "VALUES".length, end)
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[V]]
    var i = 0
    while (i < body.length) {
      if (body(i) == '(') {
        val (tuple, next) = parseTuple(body, i)
        out += tuple
        i = next
      } else i += 1
    }
    out.toSeq
  }

  private def parseTuple(s: String, open: Int): (Seq[V], Int) = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[V]
    val cur = new StringBuilder
    var depth = 1
    var inQuote = false
    var i = open + 1
    def flush(): Unit = {
      val t = cur.toString.trim
      cur.clear()
      fields += (
        if (t.startsWith("'")) S(t.substring(1, t.length - 1).replace("''", "'"))
        else if (t.equalsIgnoreCase("TRUE")) B(true)
        else if (t.equalsIgnoreCase("FALSE")) B(false)
        else if (t.equalsIgnoreCase("NULL") || t.endsWith("()")) Null // NOW() etc.
        else N(BigDecimal(t)))
    }
    while (depth > 0) {
      val c = s(i)
      if (inQuote) {
        if (c == '\'' && i + 1 < s.length && s(i + 1) == '\'') { cur.append("''"); i += 1 }
        else if (c == '\'') { inQuote = false; cur.append(c) }
        else cur.append(c)
      } else c match {
        case '\'' => inQuote = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; if (depth > 0) cur.append(c) else flush()
        case ',' if depth == 1 => flush()
        case _ => cur.append(c)
      }
      i += 1
    }
    (fields.toSeq, i)
  }

  private def str(v: V): String = v.asInstanceOf[S].s
  private def num(v: V): Long = v.asInstanceOf[N].n.toLong
  private def bool(v: V): Boolean = v.asInstanceOf[B].b

  /** The six master tables as DataFrames with the Model schemas. */
  def masterFrames(spark: SparkSession, initSqlPath: String): Map[String, DataFrame] = {
    import graft.procurement.Model._
    import spark.implicits._
    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(initSqlPath)), java.nio.charset.StandardCharsets.UTF_8)

    val suppliers = tuples(sql, "suppliers").zipWithIndex.map { case (t, i) =>
      Supplier(i + 1, str(t(0)), str(t(1)), str(t(2)), str(t(3)), bool(t(4)))
    }
    val products = tuples(sql, "products").zipWithIndex.map { case (t, i) =>
      Product(i + 1, str(t(0)), str(t(1)), str(t(2)), str(t(3)), bool(t(4)))
    }
    val warehouses = tuples(sql, "warehouses").zipWithIndex.map { case (t, i) =>
      Warehouse(i + 1, str(t(0)), str(t(1)), str(t(2)), bool(t(3)))
    }
    val sp = tuples(sql, "supplier_products").map { t =>
      Row(num(t(0)), num(t(1)), num(t(2)).toInt, num(t(3)).toInt, num(t(4)).toInt,
        t(5).asInstanceOf[N].n.underlying.setScale(4), str(t(6)), bool(t(7)))
    }
    val ss = tuples(sql, "safety_stock").map(t => SafetyStock(num(t(0)), num(t(1)).toInt))
    val ssw = tuples(sql, "safety_stock_by_warehouse").map(t =>
      SafetyStockByWarehouse(num(t(0)), num(t(1)), num(t(2)).toInt))

    Map(
      "suppliers" -> suppliers.toDF(),
      "products" -> products.toDF(),
      "warehouses" -> warehouses.toDF(),
      "supplier_products" -> spark.createDataFrame(
        spark.sparkContext.parallelize(sp), supplierProductSchema),
      "safety_stock" -> ss.toDF(),
      "safety_stock_by_warehouse" -> ssw.toDF())
  }
}
