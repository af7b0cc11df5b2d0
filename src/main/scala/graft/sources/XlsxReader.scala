package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal xlsx (SpreadsheetML) reader closing the S1/S2 ingestion gap
  * (reference: src/thrive_cash_processing_dag.py:88-107 reads sheets
  * `TC_Data`, `Sales`, `Customers` from `tc_raw_data.xlsx`).
  *
  * Built on the JDK only (java.util.zip + StAX) — the environment has no
  * spreadsheet library, and an xlsx is just a zip of XML parts:
  * `xl/workbook.xml` (sheet names), `xl/_rels/workbook.xml.rels` (sheet
  * targets), `xl/sharedStrings.xml` (interned strings), and one
  * `xl/worksheets/sheetN.xml` per sheet (sparse rows of typed cells).
  *
  * This is a DRIVER-SIDE ingestion boundary by design: an xlsx is a single
  * small file (the reference's is an HTTP download), unsplittable and
  * wholly unsuited to distributed scan. The converter's job is to get the
  * data INTO parquet staging once; everything downstream is distributed.
  */
object XlsxReader {

  private val factory = XMLInputFactory.newInstance()
  factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
  factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)

  /** One parsed sheet: header row + data rows (cells as raw strings —
    * numbers in Excel's serial form, shared strings resolved). */
  case class Sheet(header: Seq[String], rows: Seq[Seq[Option[String]]])

  private def withXml[T](zip: ZipFile, entry: String)(f: XMLStreamReader => T): Option[T] = {
    Option(zip.getEntry(entry)).map { e =>
      val in = zip.getInputStream(e)
      val r = factory.createXMLStreamReader(in)
      try f(r)
      finally { r.close(); in.close() }
    }
  }

  /** sheet name → worksheet part path, via workbook.xml + its rels. */
  private def sheetTargets(zip: ZipFile): Map[String, String] = {
    val rels = withXml(zip, "xl/_rels/workbook.xml.rels") { r =>
      val m = mutable.Map.empty[String, String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
          m(r.getAttributeValue(null, "Id")) = r.getAttributeValue(null, "Target")
      }
      m.toMap
    }.getOrElse(Map.empty)
    withXml(zip, "xl/workbook.xml") { r =>
      val m = mutable.Map.empty[String, String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          // the r:id attribute is namespaced; scan attributes by local name
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id").map(r.getAttributeValue)
          rid.flatMap(rels.get).foreach { target =>
            val path = if (target.startsWith("/")) target.drop(1)
            else if (target.startsWith("xl/")) target else s"xl/$target"
            m(name) = path
          }
        }
      }
      m.toMap
    }.getOrElse(Map.empty)
  }

  /** sharedStrings.xml: one entry per `<si>`, rich-text runs concatenated. */
  private def sharedStrings(zip: ZipFile): IndexedSeq[String] =
    withXml(zip, "xl/sharedStrings.xml") { r =>
      val out = mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            if (r.getLocalName == "si") cur.clear()
            else if (r.getLocalName == "t") inT = true
          case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == "t") inT = false
            else if (r.getLocalName == "si") out += cur.toString
          case _ =>
        }
      }
      out.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** "BC12" → 0-based column index (A=0, Z=25, AA=26 …). */
  private[sources] def colIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  /** Parse one worksheet: sparse cells placed by reference, rows padded to
    * the header width. Cell types: `s` shared string, `inlineStr`, `str`
    * (formula result), `b` boolean, default numeric/raw. */
  private def parseSheet(zip: ZipFile, part: String, shared: IndexedSeq[String]): Sheet =
    withXml(zip, part) { r =>
      val rows = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[(Int, String)]]
      var cells: mutable.ArrayBuffer[(Int, String)] = null
      var cellCol = -1
      var lastCol = -1 // fallback index tracks EVERY cell (valued or empty)
      var cellType = ""
      var hadValue = false
      var inV = false
      val v = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => cells = mutable.ArrayBuffer.empty; lastCol = -1
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex)
                .getOrElse(lastCol + 1)
              lastCol = cellCol
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              v.clear()
              hadValue = false
            // buffer persists across <t> runs so rich-text inlineStr cells
            // concatenate like the sharedStrings path does
            case "t" | "v" => inV = true
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if inV => v.append(r.getText); hadValue = true
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "t" | "v" => inV = false
            case "c" =>
              if (cellCol >= 0 && hadValue) {
                val value = cellType match {
                  case "s" =>
                    val i = v.toString.trim.toInt
                    if (i >= 0 && i < shared.size) shared(i) else ""
                  case "b" => if (v.toString.trim == "1") "true" else "false"
                  case _ => v.toString
                }
                cells += ((cellCol, value))
              }
              cellCol = -1
            case "row" => if (cells != null) { rows += cells; cells = null }
            case _ =>
          }
          case _ =>
        }
      }
      if (rows.isEmpty) Sheet(Seq.empty, Seq.empty)
      else {
        val header = {
          val h = rows.head.toMap
          (0 to (if (h.isEmpty) -1 else h.keys.max)).map(i => h.getOrElse(i, s"_c$i"))
        }
        val data = rows.tail.map { cs =>
          val m = cs.toMap
          header.indices.map(i => m.get(i).filter(_.nonEmpty)): Seq[Option[String]]
        }
        Sheet(header, data.toSeq)
      }
    }.getOrElse(Sheet(Seq.empty, Seq.empty))

  /** Read one named sheet. Throws with the available names if absent
    * (mirrors pandas' sheet_name error). */
  def readSheet(path: String, sheetName: String): Sheet = {
    val zip = new ZipFile(path)
    try {
      val targets = sheetTargets(zip)
      val part = targets.getOrElse(sheetName,
        throw new IllegalArgumentException(
          s"sheet '$sheetName' not found; available: ${targets.keys.mkString(", ")}"))
      parseSheet(zip, part, sharedStrings(zip))
    } finally zip.close()
  }

  /** A sheet as an all-string DataFrame (header = column names) — the
    * untyped staging form for sheets with no enforced contract
    * (Sales/Customers, reference :102-107). */
  def sheetDf(spark: SparkSession, path: String, sheetName: String): DataFrame = {
    val sheet = readSheet(path, sheetName)
    val schema = StructType(sheet.header.map(StructField(_, StringType, nullable = true)))
    val rows: java.util.List[Row] = new java.util.ArrayList()
    sheet.rows.foreach(r => rows.add(Row.fromSeq(r.map(_.orNull))))
    spark.createDataFrame(rows, schema)
  }

  /** Excel serial date (days since 1899-12-30, 1900 system — the epoch
    * pandas uses) → microseconds-precision LocalDateTime. */
  private[sources] def serialToDateTime(serial: Double): java.time.LocalDateTime = {
    val micros = math.round((serial - 25569.0) * 86400.0 * 1e6) // 25569 = 1970-01-01
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
  }

  private def parseTimestamp(s: String): java.time.LocalDateTime = {
    val t = s.trim
    if (t.matches("-?[0-9]+(\\.[0-9]+)?")) serialToDateTime(t.toDouble)
    else {
      val iso = t.replace(' ', 'T')
      if (iso.contains("T")) java.time.LocalDateTime.parse(iso)
      else java.time.LocalDate.parse(iso).atStartOfDay()
    }
  }

  /** The TC_Data sheet under the enforced transaction contract
    * ([[Tables.transactionSchema]]): typed columns by NAME, Excel serial or
    * ISO timestamps both accepted, malformed cells → null for the
    * validation layer (the PERMISSIVE contract readTransactionsCsv has). */
  def readTransactions(spark: SparkSession, path: String, sheetName: String = "TC_Data"): DataFrame = {
    val sheet = readSheet(path, sheetName)
    val idx = sheet.header.zipWithIndex.toMap
    def cell(r: Seq[Option[String]], name: String): Option[String] =
      idx.get(name).flatMap(r.lift(_).flatten)
    val rows: java.util.List[Row] = new java.util.ArrayList()
    sheet.rows.foreach { r =>
      def opt[T](name: String)(f: String => T): Any =
        cell(r, name).flatMap(s => scala.util.Try(f(s)).toOption).getOrElse(null)
      rows.add(Row(
        cell(r, "transaction_id").orNull,
        cell(r, "customer_id").orNull,
        opt("amount")(_.trim.toDouble),
        opt("timestamp")(parseTimestamp),
        cell(r, "transaction_type").orNull))
    }
    // nullable copy: malformed feeds surface as nulls for validate_source,
    // they must not crash the reader
    val nullable = StructType(Tables.transactionSchema.map(_.copy(nullable = true)))
    Tables.ensureConf(spark).createDataFrame(rows, nullable)
  }
}
