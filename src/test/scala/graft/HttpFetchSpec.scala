package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{HttpFetch, XlsxReader}

/** End-to-end S1: a real HTTP round-trip (JDK HttpServer on loopback — no
  * network egress) feeding the xlsx staging path, plus the reference's
  * fail-fast contract on error statuses. */
class HttpFetchSpec extends AnyFunSuite {
  import TestSpark._

  private def withServer(test: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.start()
      test(server, server.getAddress.getPort)
    } finally server.stop(0)
  }

  test("fetched workbook flows through the xlsx reader (fetch -> stage chain)") {
    val dir = Files.createTempDirectory("graft-fetch")
    val src = dir.resolve("served.xlsx").toString
    XlsxFixture.write(src, Seq(
      "TC_Data" -> Seq(
        Seq("transaction_id", "customer_id", "amount", "timestamp", "transaction_type"),
        Seq("T1", "C1", "10", "2024-01-01", "earned"),
        Seq("T2", "C1", "-4", "2024-01-02", "spent"))))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(src))

    withServer { (server, port) =>
      server.createContext("/feed.xlsx", exchange => {
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        try exchange.getResponseBody.write(bytes) finally exchange.close()
      })
      val dest = dir.resolve("fetched.xlsx")
      HttpFetch.fetch(s"http://127.0.0.1:$port/feed.xlsx", dest)
      val df = XlsxReader.readTransactions(spark, dest.toString)
      assert(df.count() === 2)
      assert(df.orderBy("transaction_id").collect()(0).getString(0) === "T1")
    }
  }

  test("non-2xx status fails fast and leaves no partial file behind") {
    withServer { (server, port) =>
      server.createContext("/missing.xlsx", exchange => {
        exchange.sendResponseHeaders(404, -1)
        exchange.close()
      })
      val dir = Files.createTempDirectory("graft-fetch-404")
      val dest = dir.resolve("nope.xlsx")
      val err = intercept[java.io.IOException](
        HttpFetch.fetch(s"http://127.0.0.1:$port/missing.xlsx", dest))
      assert(err.getMessage.contains("404"))
      assert(!Files.exists(dest))
      // the temp download must be cleaned up too
      val leftovers = Files.list(dir)
      try assert(leftovers.count() === 0) finally leftovers.close()
    }
  }
}
