package graft.sources.vortex

import java.io.{ByteArrayInputStream, FileInputStream, IOException, InputStream}
import java.net.{HttpURLConnection, URI, URL}
import java.util.concurrent.atomic.AtomicLong
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A minimal first-party `s3a://` Hadoop FileSystem speaking the S3
  * REST protocol over HTTP — ListObjectsV2, ranged GET, HEAD, PUT,
  * PUT+`x-amz-copy-source` (COPY), DELETE — with [[S3SigV4]] request
  * signing when credentials are configured.
  *
  * Exists because this build environment has no hadoop-aws /
  * aws-sdk-bundle jars (zero egress; OBJECT_STORES.md), yet S5 needs
  * the s3a config path to EXECUTE, not just be documented: with this
  * class registered as `fs.s3a.impl`, `ObjectStoreConfig.s3a(...)` +
  * `spark.read.format("vortex").load("s3a://bucket/...")` runs end to
  * end against any S3-compatible HTTP endpoint (S3aLiteSpec drives it
  * against a loopback in-process S3 server and counts the wire ops).
  * On a real cluster with hadoop-aws present, the stock S3AFileSystem
  * takes precedence simply by not setting `fs.s3a.impl` here.
  *
  * Semantics (the ones the vortex format relies on — OBJECT_STORES.md
  * table): rename = server-side COPY + DELETE (non-atomic, reader-side
  * invariant held by dot-hidden tmp names); directories are virtual
  * prefixes; listing is strongly consistent on S3 since 2020. Honors
  * `fs.s3a.endpoint`, `fs.s3a.path.style.access`,
  * `fs.s3a.endpoint.region`, `fs.s3a.access.key`/`secret.key` — the
  * same keys the stock connector reads, so configuration is portable
  * both ways.
  */
class S3aLiteFileSystem extends FileSystem {
  import S3aLiteFileSystem._

  private var fsUri: URI = _
  private var bucket: String = _
  private var endpoint: URI = _
  private var pathStyle = true
  private var region = "us-east-1"
  private var creds: Option[S3SigV4.Creds] = None
  private var workDir: Path = _

  override def getScheme: String = "s3a"
  override def getUri: URI = fsUri

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    bucket = name.getAuthority
    fsUri = URI.create(s"${name.getScheme}://$bucket")
    val ep = conf.get("fs.s3a.endpoint", "")
    if (ep.isEmpty)
      throw new IOException("S3aLite: fs.s3a.endpoint must be set")
    endpoint = URI.create(if (ep.contains("://")) ep else s"https://$ep")
    pathStyle = conf.getBoolean("fs.s3a.path.style.access", false)
    region = conf.get("fs.s3a.endpoint.region", "us-east-1")
    val ak = conf.get("fs.s3a.access.key", "")
    val sk = conf.get("fs.s3a.secret.key", "")
    creds = if (ak.nonEmpty && sk.nonEmpty) Some(S3SigV4.Creds(ak, sk)) else None
    workDir = makeQualified(new Path("/"))
  }

  // ---- key/url plumbing ------------------------------------------------

  private def keyOf(p: Path): String = {
    val u = makeQualified(p).toUri.getPath
    u.stripPrefix("/")
  }

  private def urlFor(key: String, query: Seq[(String, String)]): URL = {
    val qs = S3SigV4.canonicalQuery(query)
    val keyPath = "/" + S3SigV4.uriEncode(key, keepSlash = true)
    val base =
      if (pathStyle) s"${endpoint.getScheme}://${endpoint.getAuthority}/$bucket$keyPath"
      else s"${endpoint.getScheme}://$bucket.${endpoint.getAuthority}$keyPath"
    new URL(if (qs.isEmpty) base else s"$base?$qs")
  }

  /** One signed HTTP round trip. Returns the open connection after
    * checking the status against `okCodes`. */
  private def request(method: String, key: String,
                      query: Seq[(String, String)] = Nil,
                      extraHeaders: Seq[(String, String)] = Nil,
                      body: Option[(InputStream, Long)] = None,
                      payloadSha: String = S3SigV4.EmptySha256,
                      okCodes: Set[Int] = Set(200, 204, 206)): HttpURLConnection = {
    val url = urlFor(key, query)
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(15000)
    conn.setReadTimeout(120000)
    val hostHdr = url.getHost +
      (if (url.getPort != -1 && url.getPort != url.getDefaultPort) s":${url.getPort}" else "")
    val amzDate = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    val signedHeaders = Seq(
      "host" -> hostHdr,
      "x-amz-content-sha256" -> payloadSha,
      "x-amz-date" -> amzDate) ++ extraHeaders
    signedHeaders.filterNot(_._1 == "host")
      .foreach { case (k, v) => conn.setRequestProperty(k, v) }
    creds.foreach { c =>
      // sign over the LOGICAL (unencoded) path — sign() single-encodes
      // it, matching S3's rule for the s3 service; url.getPath is
      // already encoded and would double-encode
      val signPath = if (pathStyle) s"/$bucket/$key" else s"/$key"
      val (auth, _) = S3SigV4.sign(method, signPath, query, signedHeaders,
        payloadSha, region, "s3", amzDate, c)
      conn.setRequestProperty("Authorization", auth)
    }
    body match {
      case Some((in, len)) =>
        conn.setDoOutput(true)
        conn.setFixedLengthStreamingMode(len)
        val out = conn.getOutputStream
        try {
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally { out.close(); in.close() }
      case None => ()
    }
    val code = conn.getResponseCode
    count(method, query, extraHeaders)
    if (!okCodes.contains(code)) {
      val err = Option(conn.getErrorStream).map(s => new String(s.readAllBytes(), "UTF-8"))
      conn.disconnect()
      if (code == 404) throw new java.io.FileNotFoundException(s"s3a://$bucket/$key")
      throw new IOException(s"S3aLite: $method $url → HTTP $code ${err.getOrElse("")}")
    }
    conn
  }

  private def count(method: String, query: Seq[(String, String)],
                    headers: Seq[(String, String)]): Unit = method match {
    case "GET" if query.exists(_._1 == "list-type") => Ops.lists.incrementAndGet()
    case "GET" => Ops.gets.incrementAndGet()
    case "HEAD" => Ops.heads.incrementAndGet()
    case "PUT" if headers.exists(_._1 == "x-amz-copy-source") => Ops.copies.incrementAndGet()
    case "PUT" => Ops.puts.incrementAndGet()
    case "DELETE" => Ops.deletes.incrementAndGet()
    case _ => ()
  }

  // ---- ListObjectsV2 ---------------------------------------------------

  private case class Listing(keys: Seq[(String, Long, Long)], prefixes: Seq[String])

  private def listPrefix(prefix: String, delimiter: Option[String],
                         maxKeys: Int = 1000,
                         stopWhenFound: Boolean = false): Listing = {
    var token: Option[String] = None
    val keys = Seq.newBuilder[(String, Long, Long)]
    val prefixes = Seq.newBuilder[String]
    var found = false
    var more = true
    while (more) {
      val q = Seq("list-type" -> "2", "prefix" -> prefix,
        "max-keys" -> maxKeys.toString) ++
        delimiter.map("delimiter" -> _) ++ token.map("continuation-token" -> _)
      val conn = request("GET", "", q)
      val doc = try {
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.setNamespaceAware(false)
        f.newDocumentBuilder().parse(conn.getInputStream)
      } finally conn.disconnect()
      def texts(tag: String, el: org.w3c.dom.Element): Seq[String] = {
        val nl = el.getElementsByTagName(tag)
        (0 until nl.getLength).map(nl.item(_).getTextContent)
      }
      val contents = doc.getElementsByTagName("Contents")
      (0 until contents.getLength).foreach { i =>
        val el = contents.item(i).asInstanceOf[org.w3c.dom.Element]
        val mtime = texts("LastModified", el).headOption
          .map(s => java.time.Instant.parse(s).toEpochMilli).getOrElse(0L)
        keys += ((texts("Key", el).head, texts("Size", el).head.toLong, mtime))
      }
      val cps = doc.getElementsByTagName("CommonPrefixes")
      (0 until cps.getLength).foreach { i =>
        prefixes ++= texts("Prefix", cps.item(i).asInstanceOf[org.w3c.dom.Element])
      }
      val truncated = Option(doc.getElementsByTagName("IsTruncated").item(0))
        .exists(_.getTextContent == "true")
      token = Option(doc.getElementsByTagName("NextContinuationToken").item(0))
        .map(_.getTextContent)
      found = found || contents.getLength > 0 || cps.getLength > 0
      // stopWhenFound = existence probe: stop at the first page that
      // names anything — but keep paginating through EMPTY truncated
      // pages (S3 documents pages may carry fewer keys than MaxKeys),
      // or a legally-empty first page would read as non-existence
      more = truncated && token.isDefined && !(stopWhenFound && found)
    }
    Listing(keys.result(), prefixes.result())
  }

  // ---- FileSystem API --------------------------------------------------

  private def fileStatus(key: String, len: Long, mtime: Long): FileStatus =
    new FileStatus(len, false, 1, 64 * 1024 * 1024, mtime,
      makeQualified(new Path("/" + key)))

  private def dirStatus(key: String): FileStatus =
    new FileStatus(0, true, 1, 0, 0,
      makeQualified(new Path(if (key.isEmpty) "/" else "/" + key.stripSuffix("/"))))

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty) return dirStatus("")
    try {
      val conn = request("HEAD", key)
      val len = conn.getHeaderFieldLong("Content-Length", 0)
      val mtime = conn.getLastModified
      conn.disconnect()
      fileStatus(key, len, mtime)
    } catch {
      case _: java.io.FileNotFoundException =>
        // existence probe: stop at the first page that names anything —
        // paginating to exhaustion would turn exists() on a 10k-object
        // prefix into 10k LIST round trips on a real endpoint
        val l = listPrefix(key + "/", delimiter = Some("/"), maxKeys = 1,
          stopWhenFound = true)
        if (l.keys.nonEmpty || l.prefixes.nonEmpty) dirStatus(key)
        else throw new java.io.FileNotFoundException(f.toString)
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    val prefix = if (key.isEmpty) "" else key + "/"
    val l = listPrefix(prefix, delimiter = Some("/"))
    val files = l.keys.filterNot(_._1 == prefix) // S3 "directory marker" objects
      .map { case (k, sz, mt) => fileStatus(k, sz, mt) }
    val dirs = l.prefixes.map(p => dirStatus(p.stripSuffix("/")))
    if (files.isEmpty && dirs.isEmpty) {
      // empty prefix: a file path lists as itself; a missing one throws
      val st = getFileStatus(f)
      if (st.isFile) Array(st) else Array.empty
    } else (files ++ dirs).toArray
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val st = getFileStatus(f)
    if (st.isDirectory) throw new IOException(s"S3aLite: cannot open directory $f")
    new FSDataInputStream(new S3aLiteInput(keyOf(f), st.getLen))
  }

  /** Ranged-GET input: sequential reads fetch `ReadAhead`-sized
    * windows; positioned reads (footer tails, chunk pages) issue one
    * ranged GET each — the access pattern the format is designed for. */
  private final class S3aLiteInput(key: String, len: Long)
      extends FSInputStream {
    private var pos = 0L
    private var window: Array[Byte] = Array.emptyByteArray
    private var windowStart = 0L

    private def fetch(start: Long, n: Int): Array[Byte] = {
      if (n <= 0 || start >= len) return Array.emptyByteArray
      val end = math.min(len, start + n) - 1
      val conn = request("GET", key,
        extraHeaders = Seq("range" -> s"bytes=$start-$end"))
      try conn.getInputStream.readAllBytes()
      finally conn.disconnect()
    }

    override def seek(p: Long): Unit = {
      if (p < 0 || p > len) throw new java.io.EOFException(s"seek $p of $len")
      pos = p
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(): Int = {
      val b = new Array[Byte](1)
      if (read(b, 0, 1) < 0) -1 else b(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, n: Int): Int = {
      if (n == 0) return 0
      if (pos >= len) return -1
      if (pos < windowStart || pos >= windowStart + window.length) {
        window = fetch(pos, math.max(n, ReadAhead))
        windowStart = pos
        // InputStream contract: 0-byte returns while pos < len are
        // forbidden (readFully callers would spin forever). An empty
        // fetch here means the endpoint returned an empty 200/206 body
        // or the object shrank after open — surface it as truncation.
        if (window.isEmpty)
          throw new java.io.EOFException(
            s"S3aLite: $key truncated at $pos of $len (empty ranged GET)")
      }
      val avail = (windowStart + window.length - pos).toInt
      val take = math.min(n, avail)
      System.arraycopy(window, (pos - windowStart).toInt, b, off, take)
      pos += take
      take
    }

    override def read(position: Long, b: Array[Byte], off: Int, n: Int): Int = {
      if (position >= len) return -1
      val got = fetch(position, n)
      System.arraycopy(got, 0, b, off, got.length)
      got.length
    }
  }

  /** Writes spill to a local part file; once the part-size threshold
    * is crossed a multipart upload is initiated and each full part
    * streams out as an UploadPart, so object size is bounded by S3's
    * 10,000-part × part-size limit instead of the 5 GiB single-PUT cap
    * (a >5 GiB task output MUST go multipart — this is a completeness
    * requirement, not a throughput optimization). Small objects keep
    * the one-PUT shape. Failure aborts the multipart upload so no
    * orphaned parts accrue storage. */
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    if (!overwrite && exists(f))
      throw new FileAlreadyExistsException(f.toString)
    val partSize = getConf.getLong("fs.s3a.multipart.size", 64L * 1024 * 1024)
    // AWS rejects non-final parts under 5 MiB — but only at
    // CompleteMultipartUpload time (EntityTooSmall), AFTER every byte
    // has shipped. Enforce the floor up front so a misconfigured part
    // size fails before any data moves. The floor itself is
    // configurable (default = S3's enforced minimum) because loopback
    // test endpoints legitimately accept tiny parts.
    val minPart = getConf.getLong("fs.s3a.internal.part.min.size", 5L * 1024 * 1024)
    require(partSize >= math.max(1L, minPart),
      s"fs.s3a.multipart.size=$partSize below the S3 minimum part size " +
        s"$minPart (EntityTooSmall would fail the upload at complete time)")
    val out = new java.io.OutputStream {
      private var closed = false
      private var tmp = java.io.File.createTempFile("s3alite", ".part")
      tmp.deleteOnExit()
      private var fileOut = new java.io.FileOutputStream(tmp)
      private var digest = java.security.MessageDigest.getInstance("SHA-256")
      private var buffered = 0L
      private var uploadId: Option[String] = None
      private val etags = scala.collection.mutable.ListBuffer[String]()

      override def write(b: Int): Unit = {
        fileOut.write(b); digest.update(b.toByte); buffered += 1
        if (buffered >= partSize) rollPart()
      }
      override def write(b: Array[Byte], off: Int, n: Int): Unit = {
        // a single chunk may overfill the part: split at the boundary
        var o = off; var left = n
        while (left > 0) {
          val take = math.min(left.toLong, partSize - buffered).toInt
          fileOut.write(b, o, take); digest.update(b, o, take); buffered += take
          o += take; left -= take
          if (buffered >= partSize) rollPart()
        }
      }

      private def initiate(): String = {
        val conn = request("POST", key, query = Seq("uploads" -> ""))
        val doc = try javax.xml.parsers.DocumentBuilderFactory.newInstance()
          .newDocumentBuilder().parse(conn.getInputStream)
        finally conn.disconnect()
        doc.getElementsByTagName("UploadId").item(0).getTextContent
      }

      /** ship the current spill as the next part and reset it */
      private def rollPart(): Unit = {
        fileOut.close()
        val id = uploadId.getOrElse { val i = initiate(); uploadId = Some(i); i }
        val sha = digest.digest().map(x => f"${x & 0xff}%02x").mkString
        val in = new FileInputStream(tmp)
        val conn = try request("PUT", key,
          query = Seq("partNumber" -> (etags.length + 1).toString, "uploadId" -> id),
          body = Some((in, tmp.length)), payloadSha = sha)
        catch { case e: Throwable => abort(); throw e }
        // a missing ETag means CompleteMultipartUpload is guaranteed to
        // fail (its manifest echoes each part's ETag) — fail the part
        // PUT now, not after every remaining part has shipped
        val etag = Option(conn.getHeaderField("ETag")).getOrElse {
          conn.disconnect(); abort()
          throw new java.io.IOException(
            s"UploadPart ${etags.length + 1} for $key returned no ETag header")
        }
        etags += etag
        conn.disconnect()
        tmp.delete()
        tmp = java.io.File.createTempFile("s3alite", ".part")
        tmp.deleteOnExit()
        fileOut = new java.io.FileOutputStream(tmp)
        digest = java.security.MessageDigest.getInstance("SHA-256")
        buffered = 0L
      }

      private def abort(): Unit = uploadId.foreach { id =>
        try request("DELETE", key, query = Seq("uploadId" -> id),
          okCodes = Set(200, 204)).disconnect()
        catch { case _: Exception => () } // best effort; parts expire by bucket policy
      }

      // idempotent: FilterOutputStream wrappers may close twice, and a
      // second close must not re-PUT (the digest is consumed and the
      // spill file deleted by the first)
      override def close(): Unit = {
        if (closed) return
        closed = true
        try {
          uploadId match {
            case None =>
              fileOut.close()
              val sha = digest.digest().map(x => f"${x & 0xff}%02x").mkString
              val in = new FileInputStream(tmp)
              try request("PUT", key, body = Some((in, tmp.length)), payloadSha = sha)
                .disconnect()
              finally tmp.delete()
            case Some(id) =>
              try {
                if (buffered > 0) rollPart() // final short part (allowed)
                // rollPart reopens a fresh spill stream for a next part
                // that will never come — close it (and in the no-roll
                // case this closes the real stream): an unclosed fd
                // per multipart object leaks under long-lived executors
                fileOut.close()
                val xml = etags.zipWithIndex.map { case (e, i) =>
                  s"<Part><PartNumber>${i + 1}</PartNumber><ETag>${e}</ETag></Part>"
                }.mkString("<CompleteMultipartUpload>", "", "</CompleteMultipartUpload>")
                  .getBytes("UTF-8")
                request("POST", key, query = Seq("uploadId" -> id),
                  body = Some((new ByteArrayInputStream(xml), xml.length)),
                  payloadSha = S3SigV4.sha256Hex(xml)).disconnect()
              } catch { case e: Throwable => abort(); throw e }
              finally tmp.delete()
          }
        } finally { tmp.delete(); () }
      }
    }
    new FSDataOutputStream(new java.io.BufferedOutputStream(out, 64 * 1024), statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("S3aLite: append is not an object-store operation")

  private def copyObject(srcKey: String, dstKey: String): Unit =
    request("PUT", dstKey, extraHeaders = Seq(
      "x-amz-copy-source" -> ("/" + bucket + "/" + S3SigV4.uriEncode(srcKey, keepSlash = true))))
      .disconnect()

  /** Hadoop FileSystem rename contract (matching S3AFileSystem): a
    * missing src or an existing-FILE dst returns false; an existing
    * DIRECTORY dst receives src nested under it; a fresh dst requires
    * its parent "directory" to exist (virtual — any object under the
    * prefix, or the bucket root). Non-vortex writers on the same
    * session (FileOutputCommitter et al.) rely on exactly these
    * semantics; silently clobbering dst would misplace their output. */
  override def rename(src: Path, dst: Path): Boolean = {
    val st = try getFileStatus(src) catch { case _: java.io.FileNotFoundException => return false }
    val dstSt = try Some(getFileStatus(dst)) catch { case _: java.io.FileNotFoundException => None }
    val target: Path = dstSt match {
      case Some(d) if d.isDirectory =>
        val nested = new Path(dst, src.getName)
        val nestedSt = try Some(getFileStatus(nested)) catch { case _: java.io.FileNotFoundException => None }
        if (nestedSt.exists(_.isFile)) return false
        nested
      case Some(_) => return false // dst exists as a file
      case None =>
        val parent = dst.getParent
        val parentOk = parent == null || keyOf(parent).isEmpty ||
          (try getFileStatus(parent).isDirectory catch { case _: java.io.FileNotFoundException => false })
        if (!parentOk) return false
        dst
    }
    if (st.isFile) {
      copyObject(keyOf(src), keyOf(target))
      request("DELETE", keyOf(src)).disconnect()
    } else {
      // per-key COPY+DELETE in parallel — a directory rename is
      // O(files) round trips on any object store; serial latency would
      // dominate large-directory commits (same pattern as the bulk
      // copy's parallel promotion)
      val prefix = keyOf(src) + "/"
      val dstPrefix = keyOf(target) + "/"
      val keys = listPrefix(prefix, delimiter = None).keys.map(_._1).toArray
      java.util.Arrays.stream(keys).parallel().forEach { k =>
        copyObject(k, dstPrefix + k.stripPrefix(prefix))
        request("DELETE", k).disconnect()
      }
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val st = try getFileStatus(f) catch { case _: java.io.FileNotFoundException => return false }
    if (st.isFile) { request("DELETE", keyOf(f)).disconnect(); true }
    else {
      val children = listPrefix(keyOf(f) + "/", delimiter = None).keys
      if (children.nonEmpty && !recursive)
        throw new IOException(s"S3aLite: directory $f is not empty")
      val keys = children.map(_._1).toArray
      java.util.Arrays.stream(keys).parallel()
        .forEach(k => request("DELETE", k).disconnect())
      true
    }
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = true // prefixes are virtual

  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }
  override def getWorkingDirectory: Path = workDir
}

object S3aLiteFileSystem {
  val ReadAhead: Int = 256 * 1024

  /** Wire-op counters (process-wide) — lets specs assert the planning
    * cost profile (LIST/HEAD/GET per query) exactly like the s3mock
    * semantics contract does. */
  object Ops {
    val gets = new AtomicLong
    val puts = new AtomicLong
    val heads = new AtomicLong
    val lists = new AtomicLong
    val deletes = new AtomicLong
    val copies = new AtomicLong
    def snapshot: Map[String, Long] = Map(
      "GET" -> gets.get, "PUT" -> puts.get, "HEAD" -> heads.get,
      "LIST" -> lists.get, "DELETE" -> deletes.get, "COPY" -> copies.get)
  }
}
