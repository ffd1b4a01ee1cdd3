package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 live-HTTP leg: fetch JSON from an API endpoint on the driver and
  * hand the payload to [[BronzeIngest.fromJsonPayloads]] — the missing
  * half of the reference's bronze ingest (`requests.get(api_url,
  * headers=headers)`, `BronzeIngestUsers.py:23-27`;
  * `bronze_ingest_streamate_mock.py:28-33`).
  *
  * The transport is injectable so tests run with no network egress: a
  * stub function, or the production [[javaHttpTransport]] pointed at a
  * loopback fixture server. Fetching happens on the DRIVER by design —
  * an API snapshot is one payload, not a distributed dataset; the data
  * becomes distributed the moment it enters `spark.read.json`. (Bulk
  * HTTP sources that need per-partition fetch use [[fetchJsonFanout]] —
  * a URL frame through `mapPartitions` with a per-partition client.)
  */
object HttpSource {

  /** One GET request: URL + headers (the reference authenticates with an
    * `x-signature` header — headers are data here, never logged). */
  final case class Request(url: String, headers: Map[String, String] = Map.empty)

  /** A transport takes a request and returns the response body, raising
    * on any non-success. Injectable for tests. */
  type Transport = Request => String

  /** Production transport on `java.net.http.HttpClient` (JDK built-in,
    * no extra dependency). Follows redirects, times out, and fails
    * loudly on non-2xx — the `raise_for_status` of the reference. */
  val javaHttpTransport: Transport = { req =>
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    val b = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(req.url))
      .timeout(java.time.Duration.ofSeconds(60))
      .GET()
    req.headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"HTTP ${resp.statusCode()} fetching ${req.url}")
    resp.body()
  }

  /** Fetch one JSON payload and land it as a DataFrame (schema inferred,
    * same as the reference's crawler-on-JSON behavior). */
  def fetchJson(spark: SparkSession, req: Request,
      transport: Transport = javaHttpTransport): DataFrame =
    BronzeIngest.fromJsonPayloads(spark, Seq(transport(req)))

  /** Crawl a paginated API: fetch `first`, follow `nextUrl(payload)`
    * until it returns None (the characters API publishes `info.next`,
    * `api/characters.json`), land ALL pages as one DataFrame.
    * `maxPages` bounds a server that links pages in a cycle. Fetching
    * is sequential on the driver — next-link pagination is inherently
    * serial; [[fetchJsonFanout]] is the distributed URL-list shape. */
  def fetchJsonPaged(spark: SparkSession, first: Request,
      nextUrl: String => Option[String],
      transport: Transport = javaHttpTransport,
      maxPages: Int = 1000): DataFrame = {
    val pages = Seq.newBuilder[String]
    var url = Option(first.url)
    var n = 0
    while (url.isDefined && n < maxPages) {
      val body = transport(Request(url.get, first.headers))
      pages += body
      url = nextUrl(body)
      n += 1
    }
    require(url.isEmpty, s"pagination did not terminate within $maxPages pages")
    BronzeIngest.fromJsonPayloads(spark, pages.result())
  }

  /** Bulk HTTP at scale: fan a URL LIST out across the cluster — each
    * partition builds ONE client (`transportFactory` runs on the
    * executor, the [[graft.operators.MultimodalOps]] per-partition
    * decoder-init pattern) and fetches its URLs serially; payloads are
    * parsed WHERE THEY LAND (`spark.read.json` over the distributed
    * body dataset), so response bytes never funnel through the driver.
    * This is the distributed shape next-link pagination can't have:
    * use [[fetchJsonPaged]] to walk the link chain once, collect the
    * page URLs, then fan the bulk re-fetch/refresh out here.
    * `parallelism` bounds concurrent connections against the API —
    * politeness is a cluster-wide budget, not per-task luck.
    *
    * Raw payloads LAND (parquet under `landingDir/run=<runId>/`) before
    * parsing, and the returned frame reads from THIS run's landing
    * partition: downstream ACTIONS never re-hit the API (an unlanded
    * fetch would, once for schema inference and again per action —
    * spec-counted). Each run writes a fresh `run=` partition instead of
    * overwriting the zone, so a refresh never destroys the raw bytes a
    * prior run's readers (or a post-mortem) depend on — the whole zone
    * stays one partitioned parquet read, and a duplicate runId fails
    * loudly rather than silently merging two fetches. An empty URL list
    * short-circuits to an empty frame: no API traffic, no empty parquet
    * directory that schema inference can't read back. Task-level
    * at-most-once is Spark's to break: a retried or speculated task
    * re-fetches its partition's URLs, so run fetch jobs with speculation
    * off and treat the GETs as idempotent — the same caveat as any
    * side-effecting foreachPartition. Raw bytes stay replayable after a
    * parser fix — the bronze-layer contract. */
  def fetchJsonFanout(spark: SparkSession, urls: Seq[String],
      landingDir: String,
      headers: Map[String, String] = Map.empty,
      transportFactory: () => Transport = () => javaHttpTransport,
      parallelism: Int = 32,
      runId: String = java.util.UUID.randomUUID().toString): DataFrame = {
    import spark.implicits._
    if (urls.isEmpty) return spark.emptyDataFrame
    val hdrs = headers // serialize the map, not `this`
    val runDir = s"$landingDir/run=$runId"
    spark.createDataset(urls)
      .repartition(math.max(1, math.min(parallelism, urls.size)))
      .mapPartitions { it =>
        val t = transportFactory() // one client per partition
        it.map(u => t(Request(u, hdrs)))
      }
      .toDF("payload")
      .write.mode("errorifexists").parquet(runDir)
    // parquet, not text: payloads may contain newlines
    spark.read.json(
      spark.read.parquet(runDir).select("payload").as[String])
  }

  /** `info.next`-style link extraction (Jackson ships with Spark):
    * returns the string at the given path unless null/absent/empty. */
  def jsonStringAt(path: String*): String => Option[String] = { body =>
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val node = path.foldLeft(root)((n, p) => if (n == null) null else n.get(p))
    Option(node).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
  }
}
