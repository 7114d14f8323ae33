package graft.model

/** CloudEvents envelope — the single data structure the HTTP Feeds spec
  * defines (reference `README.md:306-316`).
  *
  * Spark mapping (SURVEY.md §1.2): fixed `StructType` envelope; the
  * schemaless `data` payload (`README.md:315-316`) stays a raw JSON
  * string for lossless late-binding via `from_json`/`get_json_object`.
  *
  * `id` is the total-order key of the feed (`README.md:150-151`); the
  * engine additionally tracks a numeric offset (`seq`) so streaming
  * offsets support arithmetic (sequence-prefixed id scheme,
  * `README.md:159`).
  */
case class CloudEvent(
    specversion: String,              // README.md:308
    id: String,                       // README.md:309 — unique, order key
    `type`: String,                   // README.md:310
    source: String,                   // README.md:311
    time: java.sql.Timestamp,         // README.md:312 — ISO 8601 UTC
    subject: Option[String],          // README.md:313 — aggregate key
    method: Option[String],           // README.md:314 — PUT | DELETE
    datacontenttype: Option[String],  // README.md:315
    data: Option[String],             // README.md:316 — raw JSON payload
    /** CloudEvents extension attributes (README.md:318: "Further metadata
      * may be added, e.g. for traceability"): every envelope key that is
      * not a core attribute rides here verbatim as a string — a
      * distributed-tracing `traceparent` or a routing `partitionkey`
      * survives the wire unmodified. Defaulted so the 9-field
      * constructors (fixtures, state zero values) stay source-compatible. */
    extensions: Map[String, String] = Map.empty
)

object CloudEvent {
  val PUT = "PUT"
  val DELETE = "DELETE"

  /** CloudEvents view of the driver's `events` table (FIXTURES.md mapping:
    * id = zero-padded event_id so string order ≡ numeric order
    * (`README.md:159`), subject = user_id, tombstone ≙ event_type='error').
    * The typed entry point for `Dataset[CloudEvent]` operators
    * (graft.udf.LatestState, the streaming read-model state machine).
    */
  def fromEvents(ev: org.apache.spark.sql.DataFrame,
                 /** Per-row media type; the fixture table carries JSON
                   * payloads, so the spec DEFAULT (`README.md:315`) is the
                   * default — a wire-fed relation passes its own column
                   * through instead (non-JSON envelopes ride verbatim). */
                 contentType: org.apache.spark.sql.Column =
                   org.apache.spark.sql.functions.lit("application/json"),
                 /** Extension attributes (README.md:318); the fixture table
                   * carries none, so the default is the empty map. */
                 extensions: org.apache.spark.sql.Column =
                   org.apache.spark.sql.functions.typedLit(Map.empty[String, String]))
      : org.apache.spark.sql.Dataset[CloudEvent] = {
    import org.apache.spark.sql.functions._
    val spark = ev.sparkSession
    import spark.implicits._
    ev.select(
      lit("1.0").as("specversion"),
      lpad(col("event_id").cast("string"), 13, "0").as("id"),
      col("event_type").as("type"),
      lit("https://feeds.example/events").as("source"),
      timestamp_micros(col("ts_us")).as("time"),
      col("user_id").cast("string").as("subject"),
      when(col("event_type") === "error", DELETE).otherwise(PUT).as("method"),
      contentType.as("datacontenttype"),
      col("props").as("data"),
      extensions.as("extensions")
    ).as[CloudEvent]
  }
}
