package lakeshine;

import java.io.ByteArrayInputStream;
import java.io.ByteArrayOutputStream;
import java.io.EOFException;
import java.io.FileNotFoundException;
import java.io.IOException;
import java.io.InputStream;
import java.io.OutputStream;
import java.net.HttpURLConnection;
import java.net.URI;
import java.net.URL;
import java.nio.charset.StandardCharsets;
import java.security.MessageDigest;
import java.time.Instant;
import java.time.ZoneOffset;
import java.time.format.DateTimeFormatter;
import java.util.ArrayList;
import java.util.List;
import java.util.Locale;
import java.util.Map;
import java.util.TreeMap;

import javax.crypto.Mac;
import javax.crypto.spec.SecretKeySpec;

import javax.xml.parsers.DocumentBuilder;
import javax.xml.parsers.DocumentBuilderFactory;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FSDataInputStream;
import org.apache.hadoop.fs.FSDataOutputStream;
import org.apache.hadoop.fs.FSInputStream;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.permission.FsPermission;
import org.apache.hadoop.util.Progressable;
import org.w3c.dom.Document;
import org.w3c.dom.NodeList;

/**
 * Minimal Hadoop FileSystem for the {@code s3a://} scheme speaking
 * the S3 REST protocol (path-style) over plain HTTP — PUT/GET/HEAD/
 * DELETE objects, server-side copy via {@code x-amz-copy-source},
 * and ListObjectsV2 with delimiter grouping. It executes the same
 * wire protocol the reference stack's MinIO warehouse serves
 * (compose/compose.yaml; trino/catalog/iceberg.properties points
 * s3a at http://minio:9000), against any S3-compatible endpoint —
 * the in-process MiniS3Server in tests, or a real MinIO.
 *
 * Authentication: when {@code fs.s3a.access.key} and
 * {@code fs.s3a.secret.key} are configured (the same keys the stock
 * S3AFileSystem reads; the reference wires static credentials at
 * iceberg.properties:13-14), every request is signed with AWS
 * Signature Version 4 (region {@code fs.s3a.endpoint.region},
 * default us-east-1) — signed headers host, x-amz-date,
 * x-amz-content-sha256 (real payload hash; writes buffer the whole
 * object) plus x-amz-copy-source on copies and Range on windowed
 * reads. With no credentials configured, requests go out unsigned
 * (dev endpoints with auth disabled).
 *
 * Reads are RANGED: {@code open()} serves a lazy windowed stream
 * (HTTP Range GETs of {@code fs.s3a.lite.readahead} bytes, default
 * 1 MiB) — the access pattern a parquet reader needs at scale
 * (footer, then column chunks; a whole-object buffer of a 1 GB file
 * to read its 8-byte footer length would be the classic S3 parquet
 * anti-pattern). Writes are PART-BUFFERED: objects under one
 * {@code fs.s3a.lite.part.size} (default 32 MiB) go as a single
 * PUT; larger objects stream through the multipart protocol
 * (initiate / UploadPart / complete — S3's required path past 5 GB),
 * so writer memory is bounded by one part, never the object.
 * Directory markers (zero-byte {@code key/} objects)
 * make empty directories created by commit protocols exist before
 * their first file lands. Register with
 * {@code fs.s3a.impl=lakeshine.S3aLiteFileSystem} and
 * {@code fs.s3a.endpoint=http://...}.
 */
public class S3aLiteFileSystem extends FileSystem {

  private URI uri;
  private String endpoint;
  private String bucket;
  private String accessKey;
  private String secretKey;
  private String region;
  private boolean signRequests;
  private int readahead;
  private int partSize;
  private Path workingDir = new Path("/");

  @Override
  public void initialize(URI name, Configuration conf) throws IOException {
    super.initialize(name, conf);
    setConf(conf);
    this.uri = URI.create(name.getScheme() + "://" + name.getAuthority());
    this.bucket = name.getAuthority();
    this.endpoint = conf.getTrimmed("fs.s3a.endpoint", "");
    if (endpoint.isEmpty()) {
      throw new IOException("fs.s3a.endpoint is required");
    }
    this.accessKey = conf.getTrimmed("fs.s3a.access.key", "");
    this.secretKey = conf.getTrimmed("fs.s3a.secret.key", "");
    this.region = conf.getTrimmed("fs.s3a.endpoint.region", "us-east-1");
    this.signRequests = !accessKey.isEmpty() && !secretKey.isEmpty();
    // clamp BEFORE the int cast: a >= 2 GiB value would truncate
    // (4 GiB -> 0 -> infinite empty-part loop; 3 GiB -> negative)
    this.readahead = (int) Math.min(Integer.MAX_VALUE,
        Math.max(1, conf.getLong("fs.s3a.lite.readahead", 1 << 20)));
    this.partSize = (int) Math.min(Integer.MAX_VALUE,
        Math.max(1, conf.getLong("fs.s3a.lite.part.size", 32L << 20)));
  }

  @Override
  public String getScheme() {
    return "s3a";
  }

  @Override
  public URI getUri() {
    return uri;
  }

  // ------------------------------------------------------ key math

  private String key(Path p) {
    String s = makeQualified(p).toUri().getPath();
    while (s.startsWith("/")) {
      s = s.substring(1);
    }
    return s;
  }

  private URL objectUrl(String k) throws IOException {
    return new URL(endpoint + "/" + bucket + "/" + encodeKey(k));
  }

  private HttpURLConnection conn(String method, URL u) throws IOException {
    HttpURLConnection c = (HttpURLConnection) u.openConnection();
    c.setRequestMethod(method);
    // a wedged endpoint must fail the task, not hang it forever
    c.setConnectTimeout(10_000);
    c.setReadTimeout(60_000);
    return c;
  }

  /** SigV4-spec percent-encoding (AWS "UriEncode"): unreserved
   * characters A-Za-z0-9 - _ . ~ pass through, everything else is
   * %XX (uppercase hex) per UTF-8 byte. Used for BOTH path segments
   * and query parameter values, so the raw wire bytes ARE the
   * canonical form — what real S3/MinIO hash during verification
   * (java.net.URLEncoder is NOT this encoding: it emits '+' for
   * space and leaves '*' bare, which a spec-canonicalizing server
   * rejects with SignatureDoesNotMatch). */
  private static String awsEncode(String s) {
    StringBuilder out = new StringBuilder();
    for (byte raw : s.getBytes(StandardCharsets.UTF_8)) {
      int b = raw & 0xff;
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
          || (b >= '0' && b <= '9') || b == '-' || b == '_'
          || b == '.' || b == '~') {
        out.append((char) b);
      } else {
        out.append('%')
            .append(Character.toUpperCase(Character.forDigit(
                (b >> 4) & 0xf, 16)))
            .append(Character.toUpperCase(Character.forDigit(
                b & 0xf, 16)));
      }
    }
    return out.toString();
  }

  /** Percent-encode a key per path segment (shared by object URLs
   * and the x-amz-copy-source header, which real S3 requires
   * encoded the same way). */
  private static String encodeKey(String k) {
    StringBuilder enc = new StringBuilder();
    for (String part : k.split("/", -1)) {
      if (enc.length() > 0) {
        enc.append('/');
      }
      enc.append(awsEncode(part));
    }
    return enc.toString();
  }

  // ------------------------------------------------------- signing

  private static final DateTimeFormatter AMZ_DATE =
      DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
          .withZone(ZoneOffset.UTC);

  private static String hex(byte[] b) {
    StringBuilder s = new StringBuilder(b.length * 2);
    for (byte x : b) {
      s.append(Character.forDigit((x >> 4) & 0xf, 16))
          .append(Character.forDigit(x & 0xf, 16));
    }
    return s.toString();
  }

  private static String sha256Hex(byte[] data) throws IOException {
    try {
      return hex(MessageDigest.getInstance("SHA-256").digest(data));
    } catch (Exception e) {
      throw new IOException("sha256 unavailable", e);
    }
  }

  private static byte[] hmac(byte[] key, String data) throws IOException {
    try {
      Mac m = Mac.getInstance("HmacSHA256");
      m.init(new SecretKeySpec(key, "HmacSHA256"));
      return m.doFinal(data.getBytes(StandardCharsets.UTF_8));
    } catch (Exception e) {
      throw new IOException("hmac unavailable", e);
    }
  }

  /** Canonical query string: the RAW (wire-encoded) key=value pairs
   * sorted by key then value. Every query value this client emits is
   * {@link #awsEncode} (SigV4 UriEncode) encoded, so the raw wire
   * bytes already ARE the spec's canonical form — a
   * spec-canonicalizing verifier (real S3/MinIO) and a raw-byte
   * verifier (MiniS3Server) both hash the same string. */
  private static String canonicalQuery(String rawQuery) {
    if (rawQuery == null || rawQuery.isEmpty()) {
      return "";
    }
    List<String[]> pairs = new ArrayList<>();
    for (String tok : rawQuery.split("&")) {
      int i = tok.indexOf('=');
      pairs.add(i < 0 ? new String[] {tok, ""}
          : new String[] {tok.substring(0, i), tok.substring(i + 1)});
    }
    pairs.sort((a, b) -> a[0].equals(b[0])
        ? a[1].compareTo(b[1]) : a[0].compareTo(b[0]));
    StringBuilder out = new StringBuilder();
    for (String[] p : pairs) {
      if (out.length() > 0) {
        out.append('&');
      }
      out.append(p[0]).append('=').append(p[1]);
    }
    return out.toString();
  }

  /** AWS Signature Version 4 (the scheme MinIO and S3 require; see
   * the public SigV4 spec). Sets the x-amz headers in {@code extra},
   * then — when credentials are configured — x-amz-date,
   * x-amz-content-sha256 and Authorization. Must run before the
   * request body is written. */
  private void sign(HttpURLConnection c, String method, URL u,
      byte[] payload, Map<String, String> extra) throws IOException {
    for (Map.Entry<String, String> e : extra.entrySet()) {
      c.setRequestProperty(e.getKey(), e.getValue());
    }
    if (!signRequests) {
      return;
    }
    String amzDate = AMZ_DATE.format(Instant.now());
    String date = amzDate.substring(0, 8);
    String payloadHash =
        sha256Hex(payload == null ? new byte[0] : payload);
    c.setRequestProperty("x-amz-date", amzDate);
    c.setRequestProperty("x-amz-content-sha256", payloadHash);
    String host = u.getPort() == -1
        ? u.getHost() : u.getHost() + ":" + u.getPort();
    TreeMap<String, String> hdrs = new TreeMap<>();
    hdrs.put("host", host);
    hdrs.put("x-amz-content-sha256", payloadHash);
    hdrs.put("x-amz-date", amzDate);
    for (Map.Entry<String, String> e : extra.entrySet()) {
      hdrs.put(e.getKey().toLowerCase(Locale.ROOT), e.getValue().trim());
    }
    StringBuilder canonHdrs = new StringBuilder();
    StringBuilder signedHdrs = new StringBuilder();
    for (Map.Entry<String, String> e : hdrs.entrySet()) {
      canonHdrs.append(e.getKey()).append(':')
          .append(e.getValue()).append('\n');
      if (signedHdrs.length() > 0) {
        signedHdrs.append(';');
      }
      signedHdrs.append(e.getKey());
    }
    String path = u.getPath().isEmpty() ? "/" : u.getPath();
    String canonicalRequest = method + "\n" + path + "\n"
        + canonicalQuery(u.getQuery()) + "\n" + canonHdrs + "\n"
        + signedHdrs + "\n" + payloadHash;
    String scope = date + "/" + region + "/s3/aws4_request";
    String stringToSign = "AWS4-HMAC-SHA256\n" + amzDate + "\n" + scope
        + "\n"
        + sha256Hex(canonicalRequest.getBytes(StandardCharsets.UTF_8));
    byte[] k =
        ("AWS4" + secretKey).getBytes(StandardCharsets.UTF_8);
    k = hmac(k, date);
    k = hmac(k, region);
    k = hmac(k, "s3");
    k = hmac(k, "aws4_request");
    c.setRequestProperty("Authorization",
        "AWS4-HMAC-SHA256 Credential=" + accessKey + "/" + scope
            + ", SignedHeaders=" + signedHdrs
            + ", Signature=" + hex(hmac(k, stringToSign)));
  }

  // ---------------------------------------------------- primitives

  private long headLength(String k) throws IOException {
    URL u = objectUrl(k);
    HttpURLConnection c = conn("HEAD", u);
    sign(c, "HEAD", u, null, Map.of());
    int code = c.getResponseCode();
    long len = c.getContentLengthLong();
    c.disconnect();
    if (code == 200) {
      return len < 0 ? 0 : len;
    }
    if (code == 404) {
      return -1;
    }
    // a transient 5xx must NOT read as "absent": that would turn
    // server trouble into FileNotFound (and bypass overwrite checks)
    throw new IOException("HEAD " + k + " -> " + code);
  }

  /** Ranged GET of [lo, hi] inclusive. Accepts 206 (the ranged
   * reply) and 200 (a server that ignores Range and returns the
   * whole object). On 200, {@code fullObject[0]} is set true and
   * the WHOLE body returned — the caller keeps it as its window,
   * because slicing it away would re-download the entire object on
   * every subsequent window miss. */
  private byte[] getRange(String k, long lo, long hi,
      boolean[] fullObject) throws IOException {
    URL u = objectUrl(k);
    HttpURLConnection c = conn("GET", u);
    sign(c, "GET", u, null,
        Map.of("Range", "bytes=" + lo + "-" + hi));
    int code = c.getResponseCode();
    if (code == 404) {
      c.disconnect();
      throw new FileNotFoundException("s3a://" + bucket + "/" + k);
    }
    if (code != 206 && code != 200) {
      c.disconnect();
      throw new IOException("GET range " + k + " -> " + code);
    }
    fullObject[0] = code == 200;
    try (InputStream in = c.getInputStream();
         ByteArrayOutputStream out = new ByteArrayOutputStream()) {
      byte[] buf = new byte[65536];
      int n;
      while ((n = in.read(buf)) > 0) {
        out.write(buf, 0, n);
      }
      return out.toByteArray();
    } finally {
      c.disconnect();
    }
  }

  private void putObject(String k, byte[] data) throws IOException {
    URL u = objectUrl(k);
    HttpURLConnection c = conn("PUT", u);
    c.setDoOutput(true);
    sign(c, "PUT", u, data, Map.of());
    c.setFixedLengthStreamingMode(data.length);
    try (OutputStream out = c.getOutputStream()) {
      out.write(data);
    }
    int code = c.getResponseCode();
    c.disconnect();
    if (code != 200) {
      throw new IOException("PUT " + k + " -> " + code);
    }
  }

  private void copyObject(String src, String dst) throws IOException {
    URL u = objectUrl(dst);
    HttpURLConnection c = conn("PUT", u);
    sign(c, "PUT", u, null, Map.of(
        "x-amz-copy-source", "/" + bucket + "/" + encodeKey(src)));
    int code = c.getResponseCode();
    c.disconnect();
    if (code != 200) {
      throw new IOException("COPY " + src + " -> " + dst + ": " + code);
    }
  }

  private void deleteObject(String k) throws IOException {
    URL u = objectUrl(k);
    HttpURLConnection c = conn("DELETE", u);
    sign(c, "DELETE", u, null, Map.of());
    int code = c.getResponseCode();
    c.disconnect();
    // a failed DELETE treated as success would let rename() report
    // true with the source object still present (duplicate data
    // under rename-based commit protocols); 404 is fine — the
    // object is already gone, which is the goal state
    if (code != 200 && code != 204 && code != 404) {
      throw new IOException("DELETE " + k + " -> " + code);
    }
  }

  /** Aggregated (all pages) ListObjectsV2 result. */
  private static final class Listing {
    final List<String> keys = new ArrayList<>();
    final List<Long> sizes = new ArrayList<>();
    final List<String> prefixes = new ArrayList<>();
  }

  /** ListObjectsV2 with the IsTruncated/NextContinuationToken loop
   * — real S3/MinIO cap pages at 1000 keys, and a truncated listing
   * read as complete would silently lose data in rename/delete.
   * Delimiter may be empty for a deep listing. */
  private Listing list(String prefix, String delimiter)
      throws IOException {
    Listing out = new Listing();
    String token = null;
    while (true) {
      StringBuilder q = new StringBuilder("?list-type=2&prefix=")
          .append(awsEncode(prefix));
      if (!delimiter.isEmpty()) {
        q.append("&delimiter=")
            .append(awsEncode(delimiter));
      }
      if (token != null) {
        q.append("&continuation-token=")
            .append(awsEncode(token));
      }
      URL u = new URL(endpoint + "/" + bucket + q);
      HttpURLConnection c = conn("GET", u);
      sign(c, "GET", u, null, Map.of());
      if (c.getResponseCode() != 200) {
        c.disconnect();
        throw new IOException("LIST " + prefix + " failed");
      }
      Document d;
      try (InputStream in = c.getInputStream()) {
        DocumentBuilder b =
            DocumentBuilderFactory.newInstance().newDocumentBuilder();
        d = b.parse(in);
      } catch (Exception e) {
        throw new IOException("bad list response", e);
      } finally {
        c.disconnect();
      }
      List<String> keys = texts(d, "Contents", "Key");
      List<String> sizes = texts(d, "Contents", "Size");
      for (int i = 0; i < keys.size(); i++) {
        out.keys.add(keys.get(i));
        out.sizes.add(Long.parseLong(sizes.get(i)));
      }
      out.prefixes.addAll(texts(d, "CommonPrefixes", "Prefix"));
      List<String> trunc = texts(d, "ListBucketResult", "IsTruncated");
      if (trunc.isEmpty() || !"true".equals(trunc.get(0))) {
        return out;
      }
      List<String> next =
          texts(d, "ListBucketResult", "NextContinuationToken");
      if (next.isEmpty()) {
        throw new IOException("truncated list without token");
      }
      token = next.get(0);
    }
  }

  private static List<String> texts(Document d, String parent,
                                    String child) {
    List<String> out = new ArrayList<>();
    NodeList nodes = d.getElementsByTagName(parent);
    for (int i = 0; i < nodes.getLength(); i++) {
      NodeList kids =
          ((org.w3c.dom.Element) nodes.item(i))
              .getElementsByTagName(child);
      if (kids.getLength() > 0) {
        out.add(kids.item(0).getTextContent());
      }
    }
    return out;
  }

  // ------------------------------------------------------- statuses

  private Path qualify(String k, boolean dir) {
    String tail = dir && k.endsWith("/")
        ? k.substring(0, k.length() - 1) : k;
    return new Path(uri.toString() + "/" + tail);
  }

  @Override
  public FileStatus getFileStatus(Path f) throws IOException {
    String k = key(f);
    if (k.isEmpty()) {
      return new FileStatus(0, true, 1, blockSize(), 0,
          makeQualified(f));
    }
    long len = headLength(k);
    if (len >= 0) {
      return new FileStatus(len, false, 1, blockSize(), 0,
          makeQualified(f));
    }
    if (headLength(k + "/") >= 0) {
      return new FileStatus(0, true, 1, blockSize(), 0,
          makeQualified(f));
    }
    if (!list(k + "/", "").keys.isEmpty()) {
      return new FileStatus(0, true, 1, blockSize(), 0,
          makeQualified(f));
    }
    throw new FileNotFoundException("s3a://" + bucket + "/" + k);
  }

  @Override
  public FileStatus[] listStatus(Path f) throws IOException {
    FileStatus st = getFileStatus(f);
    if (!st.isDirectory()) {
      return new FileStatus[] {st};
    }
    String k = key(f);
    String prefix = k.isEmpty() ? "" : k + "/";
    Listing d = list(prefix, "/");
    List<FileStatus> out = new ArrayList<>();
    for (int i = 0; i < d.keys.size(); i++) {
      String ck = d.keys.get(i);
      if (ck.equals(prefix)) {
        continue; // the directory's own marker object
      }
      out.add(new FileStatus(d.sizes.get(i), false, 1, blockSize(), 0,
          qualify(ck, false)));
    }
    for (String p : d.prefixes) {
      out.add(new FileStatus(0, true, 1, blockSize(), 0,
          qualify(p, true)));
    }
    return out.toArray(new FileStatus[0]);
  }

  // ----------------------------------------------------------- read

  /** Lazy windowed reader over ranged GETs: seeks are free (no
   * fetch until the next read), each miss pulls one readahead-sized
   * window starting at the current position — the parquet access
   * pattern (footer at the tail, then per-column chunk ranges)
   * costs O(ranges touched), never O(object size). */
  private final class RangedIn extends FSInputStream {
    private final String k;
    private final long length;
    private long pos;
    private byte[] window = new byte[0];
    private long windowStart;

    RangedIn(String k, long length) {
      this.k = k;
      this.length = length;
    }

    @Override
    public synchronized void seek(long p) throws IOException {
      if (p < 0 || p > length) {
        throw new EOFException("seek " + p + " of " + length);
      }
      pos = p;
    }

    @Override
    public synchronized long getPos() {
      return pos;
    }

    @Override
    public boolean seekToNewSource(long targetPos) {
      return false;
    }

    private void ensureWindow() throws IOException {
      if (pos >= windowStart && pos < windowStart + window.length) {
        return;
      }
      long hi = Math.min(length, pos + readahead) - 1;
      boolean[] fullObject = new boolean[1];
      window = getRange(k, pos, hi, fullObject);
      // a Range-ignoring endpoint returned the whole object: keep
      // ALL of it as the window (re-slicing per miss would download
      // the full object once per window)
      windowStart = fullObject[0] ? 0 : pos;
      if (pos >= windowStart + window.length) {
        throw new IOException(
            "empty range reply at " + pos + " of " + k);
      }
    }

    @Override
    public synchronized int read() throws IOException {
      if (pos >= length) {
        return -1;
      }
      ensureWindow();
      return window[(int) (pos++ - windowStart)] & 0xff;
    }

    @Override
    public synchronized int read(byte[] b, int off, int len)
        throws IOException {
      if (len == 0) {
        return 0; // InputStream contract: zero-length read is not EOF
      }
      if (pos >= length) {
        return -1;
      }
      ensureWindow();
      int avail = (int) (windowStart + window.length - pos);
      int n = Math.min(len, avail);
      System.arraycopy(window, (int) (pos - windowStart), b, off, n);
      pos += n;
      return n;
    }
  }

  @Override
  public FSDataInputStream open(Path f, int bufferSize)
      throws IOException {
    String k = key(f);
    long len = headLength(k);
    if (len < 0) {
      throw new FileNotFoundException("s3a://" + bucket + "/" + k);
    }
    return new FSDataInputStream(new RangedIn(k, len));
  }

  // ---------------------------------------------------------- write

  private String initiateMultipart(String k) throws IOException {
    URL u = new URL(objectUrl(k) + "?uploads=");
    HttpURLConnection c = conn("POST", u);
    sign(c, "POST", u, null, Map.of());
    int code = c.getResponseCode();
    if (code != 200) {
      c.disconnect();
      throw new IOException("initiate multipart " + k + " -> " + code);
    }
    try (InputStream in = c.getInputStream()) {
      DocumentBuilder b =
          DocumentBuilderFactory.newInstance().newDocumentBuilder();
      Document d = b.parse(in);
      NodeList ids = d.getElementsByTagName("UploadId");
      if (ids.getLength() == 0) {
        throw new IOException("initiate reply carried no UploadId");
      }
      return ids.item(0).getTextContent();
    } catch (IOException e) {
      throw e;
    } catch (Exception e) {
      throw new IOException("bad initiate reply", e);
    } finally {
      c.disconnect();
    }
  }

  private String uploadPart(String k, String uploadId, int partNumber,
      byte[] data) throws IOException {
    URL u = new URL(objectUrl(k) + "?partNumber=" + partNumber
        + "&uploadId=" + awsEncode(uploadId));
    HttpURLConnection c = conn("PUT", u);
    c.setDoOutput(true);
    sign(c, "PUT", u, data, Map.of());
    c.setFixedLengthStreamingMode(data.length);
    try (OutputStream out = c.getOutputStream()) {
      out.write(data);
    }
    int code = c.getResponseCode();
    String etag = c.getHeaderField("ETag");
    c.disconnect();
    if (code != 200) {
      throw new IOException(
          "upload part " + partNumber + " of " + k + " -> " + code);
    }
    return etag == null ? "\"\"" : etag;
  }

  private void completeMultipart(String k, String uploadId,
      List<String> etags) throws IOException {
    StringBuilder xml =
        new StringBuilder("<CompleteMultipartUpload>");
    for (int i = 0; i < etags.size(); i++) {
      xml.append("<Part><PartNumber>").append(i + 1)
          .append("</PartNumber><ETag>").append(etags.get(i))
          .append("</ETag></Part>");
    }
    xml.append("</CompleteMultipartUpload>");
    byte[] body = xml.toString().getBytes(StandardCharsets.UTF_8);
    URL u = new URL(objectUrl(k) + "?uploadId="
        + awsEncode(uploadId));
    HttpURLConnection c = conn("POST", u);
    c.setDoOutput(true);
    sign(c, "POST", u, body, Map.of());
    c.setFixedLengthStreamingMode(body.length);
    try (OutputStream out = c.getOutputStream()) {
      out.write(body);
    }
    int code = c.getResponseCode();
    if (code != 200) {
      c.disconnect();
      throw new IOException("complete multipart " + k + " -> " + code);
    }
    // the well-known S3 pitfall: CompleteMultipartUpload can answer
    // 200 OK carrying an <Error> document — a 200 without the
    // success element means the object was NOT materialized
    try (InputStream in = c.getInputStream()) {
      DocumentBuilder b =
          DocumentBuilderFactory.newInstance().newDocumentBuilder();
      Document d = b.parse(in);
      if (d.getElementsByTagName("Error").getLength() > 0
          || d.getElementsByTagName(
              "CompleteMultipartUploadResult").getLength() == 0) {
        throw new IOException(
            "complete multipart " + k + " returned 200 with an "
            + "error body");
      }
    } catch (IOException e) {
      throw e;
    } catch (Exception e) {
      throw new IOException("bad complete reply for " + k, e);
    } finally {
      c.disconnect();
    }
  }

  /** Best-effort AbortMultipartUpload: staged parts of a failed
   * write must not linger (billed storage on real S3; memory in the
   * test server). Never masks the original failure. */
  private void abortMultipart(String k, String uploadId) {
    try {
      URL u = new URL(objectUrl(k) + "?uploadId="
          + awsEncode(uploadId));
      HttpURLConnection c = conn("DELETE", u);
      sign(c, "DELETE", u, null, Map.of());
      c.getResponseCode();
      c.disconnect();
    } catch (IOException ignored) {
      // abort is cleanup on an already-failing path
    }
  }

  /** Part-buffered writer: objects under one part size go out as a
   * single PUT (the lakehouse-commit-file case); anything larger
   * streams through the multipart protocol (initiate, one PUT per
   * {@code fs.s3a.lite.part.size} bytes, complete) — S3's required
   * path past 5 GB and the production path for large task outputs,
   * with all-or-nothing visibility (staged parts are invisible
   * until complete). Memory stays bounded by ONE part, never the
   * whole object. */
  private final class PartedOut extends OutputStream {
    private final String k;
    private ByteArrayOutputStream buf = new ByteArrayOutputStream();
    private String uploadId;
    private final List<String> etags = new ArrayList<>();
    private boolean closed;

    PartedOut(String k) {
      this.k = k;
    }

    @Override
    public void write(int b) throws IOException {
      if (closed) {
        throw new IOException("stream closed: " + k);
      }
      buf.write(b);
      if (buf.size() >= partSize) {
        flushPart();
      }
    }

    @Override
    public void write(byte[] b, int off, int len) throws IOException {
      if (closed) {
        throw new IOException("stream closed: " + k);
      }
      // fill to part boundaries so parts are exactly partSize
      while (len > 0) {
        int room = partSize - buf.size();
        int n = Math.min(room, len);
        buf.write(b, off, n);
        off += n;
        len -= n;
        if (buf.size() >= partSize) {
          flushPart();
        }
      }
    }

    private void flushPart() throws IOException {
      try {
        if (uploadId == null) {
          uploadId = initiateMultipart(k);
        }
        etags.add(uploadPart(k, uploadId, etags.size() + 1,
            buf.toByteArray()));
        buf = new ByteArrayOutputStream();
      } catch (IOException e) {
        failAborting(e);
      }
    }

    /** A failed multipart write must abort the upload (staged parts
     * otherwise linger — billed storage on real S3) and stay failed:
     * later writes/closes on this stream re-throw instead of
     * silently continuing a broken part sequence. */
    private void failAborting(IOException e) throws IOException {
      closed = true;
      if (uploadId != null) {
        abortMultipart(k, uploadId);
        uploadId = null;
      }
      throw e;
    }

    @Override
    public void close() throws IOException {
      if (closed) {
        return;
      }
      closed = true;
      if (uploadId == null) {
        putObject(k, buf.toByteArray());
        return;
      }
      try {
        if (buf.size() > 0) {
          etags.add(uploadPart(k, uploadId, etags.size() + 1,
              buf.toByteArray()));
        }
        completeMultipart(k, uploadId, etags);
      } catch (IOException e) {
        abortMultipart(k, uploadId);
        throw e;
      }
    }
  }

  @Override
  public FSDataOutputStream create(Path f, FsPermission permission,
      boolean overwrite, int bufferSize, short replication,
      long blockSize, Progressable progress) throws IOException {
    if (!overwrite && headLength(key(f)) >= 0) {
      throw new IOException("already exists: " + f);
    }
    return new FSDataOutputStream(new PartedOut(key(f)), statistics);
  }

  @Override
  public FSDataOutputStream append(Path f, int bufferSize,
      Progressable progress) throws IOException {
    throw new UnsupportedOperationException("append");
  }

  // ----------------------------------------------------- namespace

  @Override
  public boolean rename(Path src, Path dst) throws IOException {
    FileStatus s;
    try {
      s = getFileStatus(src);
    } catch (FileNotFoundException e) {
      return false;
    }
    try {
      FileStatus d = getFileStatus(dst);
      if (d.isDirectory()) {
        dst = new Path(dst, src.getName());
      } else {
        return false;
      }
    } catch (FileNotFoundException ignored) {
      // plain move to dst
    }
    String sk = key(src);
    String dk = key(dst);
    if (!s.isDirectory()) {
      copyObject(sk, dk);
      deleteObject(sk);
      return true;
    }
    Listing all = list(sk + "/", "");
    for (String k : all.keys) {
      copyObject(k, dk + "/" + k.substring(sk.length() + 1));
    }
    for (String k : all.keys) {
      deleteObject(k);
    }
    deleteObject(sk + "/");
    return true;
  }

  @Override
  public boolean delete(Path f, boolean recursive) throws IOException {
    FileStatus s;
    try {
      s = getFileStatus(f);
    } catch (FileNotFoundException e) {
      return false;
    }
    String k = key(f);
    if (!s.isDirectory()) {
      deleteObject(k);
      return true;
    }
    Listing all = list(k + "/", "");
    // the directory's own marker object does not make it non-empty
    List<String> keys = new ArrayList<>(all.keys);
    keys.remove(k + "/");
    if (!recursive && !keys.isEmpty()) {
      throw new IOException("directory not empty: " + f);
    }
    for (String ck : keys) {
      deleteObject(ck);
    }
    deleteObject(k + "/");
    return true;
  }

  @Override
  public boolean mkdirs(Path f, FsPermission permission)
      throws IOException {
    String k = key(f);
    if (k.isEmpty()) {
      return true;
    }
    // marker objects up the tree so commit protocols see their
    // freshly-created (still empty) directories; stop at the first
    // level that already exists instead of re-PUTting to the root
    Path p = f;
    while (p != null && !key(p).isEmpty()) {
      String marker = key(p) + "/";
      if (headLength(marker) >= 0) {
        break;
      }
      putObject(marker, new byte[0]);
      p = p.getParent();
    }
    return true;
  }

  @Override
  public void setWorkingDirectory(Path dir) {
    workingDir = dir;
  }

  @Override
  public Path getWorkingDirectory() {
    return workingDir;
  }

  private long blockSize() {
    return 32 * 1024 * 1024;
  }
}
