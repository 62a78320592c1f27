package graft.sources.vortex

import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing — the (fully public,
  * RFC-documented) authentication scheme every S3-compatible store
  * speaks. First-party implementation so [[S3aLiteFileSystem]] can
  * authenticate against real S3/MinIO endpoints without the
  * hadoop-aws/aws-sdk jars (absent from this build environment — see
  * OBJECT_STORES.md). Verified against the AWS documentation's
  * published test vector in S3aLiteSpec.
  *
  * Algorithm (docs.aws.amazon.com "Signature Version 4 signing
  * process"): canonical request → string-to-sign → HMAC-SHA256 chain
  * keyed on ("AWS4" + secret, date, region, service, "aws4_request").
  */
object S3SigV4 {

  final case class Creds(accessKey: String, secretKey: String)

  val EmptySha256 =
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
  val UnsignedPayload = "UNSIGNED-PAYLOAD"

  def sha256Hex(bytes: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(bytes))

  private def hex(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data.getBytes("UTF-8"))
  }

  /** RFC 3986 encode; `keepSlash` for URI paths (S3 paths are signed
    * single-encoded with '/' literal). */
  def uriEncode(s: String, keepSlash: Boolean): String = {
    val sb = new java.lang.StringBuilder
    s.getBytes("UTF-8").foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".indexOf(c) >= 0 ||
          (keepSlash && c == '/')) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Canonical query string: params URI-encoded and sorted by
    * (encoded key, encoded value). */
  def canonicalQuery(params: Seq[(String, String)]): String =
    params.map { case (k, v) => (uriEncode(k, false), uriEncode(v, false)) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  /** Compute the SigV4 headers for one request.
    *
    * @param headers headers to sign — MUST include `host`; lowercase
    *                names; values already trimmed
    * @param amzDate ISO-basic UTC instant, e.g. "20150830T123600Z"
    * @return (Authorization value, the signature hex) — callers send
    *         the signed headers plus Authorization
    */
  def sign(method: String, path: String, query: Seq[(String, String)],
           headers: Seq[(String, String)], payloadSha256: String,
           region: String, service: String, amzDate: String,
           creds: Creds): (String, String) = {
    val sortedHeaders = headers.map { case (k, v) => (k.toLowerCase, v.trim) }.sortBy(_._1)
    val canonicalHeaders = sortedHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaderNames = sortedHeaders.map(_._1).mkString(";")
    val canonicalRequest = Seq(
      method,
      uriEncode(path, keepSlash = true),
      canonicalQuery(query),
      canonicalHeaders,
      signedHeaderNames,
      payloadSha256).mkString("\n")
    val date = amzDate.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq(
      "AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes("UTF-8"))).mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      s"AWS4${creds.secretKey}".getBytes("UTF-8"), date), region), service), "aws4_request")
    val signature = hex(hmac(kSigning, stringToSign))
    val auth = s"AWS4-HMAC-SHA256 Credential=${creds.accessKey}/$scope, " +
      s"SignedHeaders=$signedHeaderNames, Signature=$signature"
    (auth, signature)
  }
}
