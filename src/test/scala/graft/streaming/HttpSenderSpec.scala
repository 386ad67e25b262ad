package graft.streaming

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** The default push sender really POSTs (reference extensions.sql:44-48
  * `net.http_post`), verified against a loopback JDK HttpServer — no
  * external network. Failure semantics: a non-2xx response throws, so
  * a push micro-batch fails and the un-acked events redeliver.
  */
class HttpSenderSpec extends AnyFunSuite {

  private def withServer(status: Int)(f: (String, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val received = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/fn", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        received.add(new String(x.getRequestBody.readAllBytes(), "UTF-8"))
        x.sendResponseHeaders(status, -1)
        x.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/fn", received)
    finally server.stop(0)
  }

  test("POSTs the envelope body and succeeds on 2xx") {
    withServer(204) { (url, received) =>
      val body = """{"view":"v","decider_id":"p1","offset":7,"data":"{}"}"""
      PushSink.HttpSender(url, body)
      assert(received.size == 1)
      assert(received.peek() == body)
    }
  }

  test("throws on a 4xx/5xx response (micro-batch fails, events redeliver)") {
    withServer(500) { (url, _) =>
      val e = intercept[java.io.IOException](PushSink.HttpSender(url, "{}"))
      assert(e.getMessage.contains("HTTP 500"))
    }
  }
}
