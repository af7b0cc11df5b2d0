package graft

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.XlsxReader

/** Generates a minimal-but-structurally-real xlsx (zip of SpreadsheetML
  * parts: workbook + rels + sharedStrings + one worksheet per sheet) and
  * reads it back — the end-to-end test of the S1/S2 ingestion boundary. */
object XlsxFixture {

  private def colLetters(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Write sheets of raw cell values; numeric-looking strings become number
    * cells, everything else goes through the shared-string table. */
  def write(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    val shared = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int = shared.getOrElseUpdate(s, shared.size)
    def isNum(s: String) = s.matches("-?[0-9]+(\\.[0-9]+)?")

    val sheetXmls = sheets.map { case (_, rows) =>
      val body = rows.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex.collect {
          case (v, ci) if v != null && v.nonEmpty =>
            val ref = s"${colLetters(ci)}${ri + 1}"
            if (isNum(v)) s"""<c r="$ref"><v>$v</v></c>"""
            else s"""<c r="$ref" t="s"><v>${sharedIdx(v)}</v></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$body</sheetData></worksheet>""".stripMargin
    }

    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>${sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="$name" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString}</sheets>
         |</workbook>""".stripMargin
    val rels =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |${sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString}
         |</Relationships>""".stripMargin
    val sst =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${shared.size}" uniqueCount="${shared.size}">
         |${shared.keys.map(s => s"<si><t>${s.replace("&", "&amp;").replace("<", "&lt;")}</t></si>").mkString}
         |</sst>""".stripMargin

    val zip = new ZipOutputStream(Files.newOutputStream(java.nio.file.Paths.get(path)))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name)); zip.write(content.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("xl/workbook.xml", workbook)
    entry("xl/_rels/workbook.xml.rels", rels)
    entry("xl/sharedStrings.xml", sst)
    sheetXmls.zipWithIndex.foreach { case (xml, i) => entry(s"xl/worksheets/sheet${i + 1}.xml", xml) }
    zip.close()
  }
}

class XlsxSpec extends AnyFunSuite {
  import TestSpark._

  private def fixture(): String = {
    val path = Files.createTempDirectory("graft-xlsx").resolve("tc_raw_data.xlsx").toString
    XlsxFixture.write(path, Seq(
      "TC_Data" -> Seq(
        Seq("transaction_id", "customer_id", "amount", "timestamp", "transaction_type"),
        Seq("T1", "C1", "100.5", "45292.25", "earned"),            // Excel serial: 2024-01-01 06:00
        Seq("T2", "C1", "-40", "2024-01-02 12:30:00", "spent"),    // ISO with space
        Seq("T3", "C2", "7.25", "2024-01-03", "earned"),           // date only
        Seq("T4", "C2", "oops", "2024-01-04", "spent")),           // malformed amount -> null
      "Sales" -> Seq(
        Seq("sale_id", "total"),
        Seq("S1", "10"), Seq("S2", "20")),
      "Customers" -> Seq(
        Seq("customer_id", "name"),
        Seq("C1", "Ada & Co <unescaped>"), Seq("C2", "Grace"))))
    path
  }

  test("TC_Data sheet reads under the enforced transaction contract") {
    val df = XlsxReader.readTransactions(spark, fixture())
    assert(df.schema.fieldNames.toSeq ===
      Seq("transaction_id", "customer_id", "amount", "timestamp", "transaction_type"))
    val rows = df.orderBy("transaction_id").collect()
    assert(rows.length === 4)
    assert(rows(0).getString(0) === "T1")
    assert(rows(0).getDouble(2) === 100.5)
    assert(rows(0).getAs[java.time.LocalDateTime](3) ===
      java.time.LocalDateTime.of(2024, 1, 1, 6, 0)) // serial 45292.25
    assert(rows(1).getAs[java.time.LocalDateTime](3) ===
      java.time.LocalDateTime.of(2024, 1, 2, 12, 30))
    assert(rows(2).getAs[java.time.LocalDateTime](3) ===
      java.time.LocalDateTime.of(2024, 1, 3, 0, 0))
    assert(rows(3).isNullAt(2)) // malformed amount surfaces as null for validation
  }

  test("Sales/Customers stage as untyped DataFrames; missing sheet errors with names") {
    val path = fixture()
    val sales = XlsxReader.sheetDf(spark, path, "Sales")
    assert(sales.columns.toSeq === Seq("sale_id", "total"))
    assert(sales.count() === 2)
    val customers = XlsxReader.sheetDf(spark, path, "Customers")
    assert(customers.orderBy("customer_id").collect()(0).getString(1) === "Ada & Co <unescaped>")
    val err = intercept[IllegalArgumentException](XlsxReader.readSheet(path, "Nope"))
    assert(err.getMessage.contains("TC_Data"))
  }

  test("parser handles inlineStr runs, r-less cells, and empty cells") {
    val path = Files.createTempDirectory("graft-xlsx-raw").resolve("raw.xlsx").toString
    val zip = new ZipOutputStream(Files.newOutputStream(java.nio.file.Paths.get(path)))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name)); zip.write(content.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""".stripMargin)
    // row 1: header (no r attrs). row 2: rich-text inlineStr (two runs),
    // an EMPTY cell, then an r-less numeric cell that must land in col C.
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c t="inlineStr"><is><t>a</t></is></c><c t="inlineStr"><is><t>b</t></is></c><c t="inlineStr"><is><t>c</t></is></c></row>
        |<row r="2"><c t="inlineStr"><is><r><t>Ada </t></r><r><t>Lovelace</t></r></is></c><c/><c><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()
    val sheet = XlsxReader.readSheet(path, "S")
    assert(sheet.header === Seq("a", "b", "c"))
    assert(sheet.rows === Seq(Seq(Some("Ada Lovelace"), None, Some("42"))))
  }

  test("XlsxToParquet main stages all three tables end-to-end") {
    val out = Files.createTempDirectory("graft-xlsx-out").toString
    graft.sources.XlsxToParquet.main(Array(fixture(), out))
    val txns = spark.read.parquet(s"$out/transactions.parquet")
    assert(txns.count() === 4)
    // partitioned staging layout by type
    assert(txns.select("transaction_type").distinct().count() === 2)
    assert(spark.read.parquet(s"$out/sales.parquet").count() === 2)
    assert(spark.read.parquet(s"$out/customers.parquet").count() === 2)
  }

  test("converted transactions flow through the FIFO matcher") {
    val df = XlsxReader.readTransactions(spark, fixture())
      .filter(org.apache.spark.sql.functions.col("amount").isNotNull)
    val matched = graft.operators.FifoMatcher.matchTransactions(df).collect()
    assert(matched.length === 3)
    val m = matched.map(r => r.getAs[String]("TRANS_ID") -> r.getAs[String]("REDEEMID")).toMap
    assert(m("T1") === "T2") // C1: first earned redeemed by first spent
  }
}
