package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.udf.SeqId

/** Golden tests encoding the spec's own literal examples
  * (reference `/root/reference/README.md`); each test cites the clause it
  * reproduces. The wire schema here is the spec-faithful one (ISO `time`,
  * object `data`) as a consumer-declared type schema (README.md:310).
  */
class SpecGoldenSuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** The 3-event inventory batch page, verbatim from README.md:29-65. */
  private val inventoryPage =
    """[{
      |  "specversion" : "1.0",
      |  "type" : "org.http-feeds.example.inventory",
      |  "source" : "https://example.http-feeds.org/inventory",
      |  "id" : "1c6b8c6e-d8d0-4a91-b51c-1f56bd04c758",
      |  "time" : "2021-01-01T00:00:01Z",
      |  "subject" : "9521234567899",
      |  "data" : { "sku": "9521234567899", "updated": "2022-01-01T00:00:01Z", "quantity": 5 }
      |},{
      |  "specversion" : "1.0",
      |  "type" : "org.http-feeds.example.inventory",
      |  "source" : "https://example.http-feeds.org/inventory",
      |  "id" : "292042fb-ab04-4653-af90-19a24032bffe",
      |  "time" : "2021-12-01T00:00:15Z",
      |  "subject" : "9521234512349",
      |  "data" : { "sku": "9521234512349", "updated": "2022-01-01T00:00:12Z", "quantity": 0 }
      |},{
      |  "specversion" : "1.0",
      |  "type" : "org.http-feeds.example.inventory",
      |  "source" : "https://example.http-feeds.org/inventory",
      |  "id" : "fa3e2a22-398c-4d02-ad08-9415e43178e6",
      |  "time" : "2021-01-01T00:00:22Z",
      |  "subject" : "9521234567899",
      |  "data" : { "sku": "9521234567899", "updated": "2022-01-01T00:00:21Z", "quantity": 4 }
      |}]""".stripMargin

  /** Spec-faithful page schema: ISO time, typed data object. */
  private val wireSchema = ArrayType(StructType(Seq(
    StructField("specversion", StringType),
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("source", StringType),
    StructField("time", TimestampType),
    StructField("subject", StringType),
    StructField("method", StringType),
    StructField("data", StructType(Seq(
      StructField("sku", StringType),
      StructField("updated", StringType),
      StructField("quantity", IntegerType)))))))

  /** Parse a page and add `pos` = position in the array (the feed order;
    * events are strongly ordered by feed position, README.md:150-151). */
  private def parsePage(page: String) =
    Seq(page).toDF("page")
      .select(posexplode(from_json(col("page"), wireSchema)).as(Seq("pos", "e")))
      .select(col("pos"), col("e.*"))

  test("inventory batch page parses to 3 ordered envelopes (README.md:20-65)") {
    val rows = parsePage(inventoryPage).orderBy("pos").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[String]("id")).toSeq === Seq(
      "1c6b8c6e-d8d0-4a91-b51c-1f56bd04c758",
      "292042fb-ab04-4653-af90-19a24032bffe",
      "fa3e2a22-398c-4d02-ad08-9415e43178e6"))
    assert(rows.map(_.getAs[String]("subject")).toSeq ===
      Seq("9521234567899", "9521234512349", "9521234567899"))
    val first = rows.head
    assert(first.getAs[String]("specversion") === "1.0")
    assert(first.getAs[String]("type") === "org.http-feeds.example.inventory")
    assert(first.getAs[org.apache.spark.sql.Row]("data").getAs[Int]("quantity") === 5)
  }

  test("empty array response = end of feed (README.md:79-82)") {
    assert(parsePage("[]").count() === 0)
  }

  test("compaction keeps only the newest entry per subject (README.md:190-267)") {
    val w = Window.partitionBy("subject").orderBy(col("pos").desc)
    val after = parsePage(inventoryPage)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .orderBy("pos").collect()
    // the spec's after-compaction page: first entry gone, order preserved
    assert(after.map(_.getAs[String]("id")).toSeq === Seq(
      "292042fb-ab04-4653-af90-19a24032bffe",
      "fa3e2a22-398c-4d02-ad08-9415e43178e6"))
  }

  test("DELETE tombstone has no data; read model applies removal (README.md:274-290)") {
    val tombstone =
      """[{
        |  "specversion" : "1.0",
        |  "type" : "org.http-feeds.example.inventory",
        |  "source" : "https://example.http-feeds.org/inventory",
        |  "id" : "06b13630-e4c3-4d85-a669-ce66fc4daa75",
        |  "time" : "2021-12-31T00:00:01Z",
        |  "subject" : "9521234567899",
        |  "method": "DELETE"
        |}]""".stripMargin
    val t = parsePage(tombstone).collect().head
    assert(t.getAs[String]("method") === "DELETE")
    assert(t.getAs[Any]("data") === null)

    // feed = inventory page ++ tombstone (appended later, README.md:276)
    val feed = parsePage(inventoryPage)
      .unionByName(parsePage(tombstone).withColumn("pos", lit(3)))
    val w = Window.partitionBy("subject").orderBy(col("pos").desc)
    val readModel = feed
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(coalesce(col("method"), lit("PUT")) =!= "DELETE")
      .collect()
    assert(readModel.map(_.getAs[String]("subject")).toSeq === Seq("9521234512349"))
  }

  test("lastEventId position honored even when the cursor event was deleted (README.md:153-154)") {
    // seq-prefixed ids make order a property of the id itself
    val ids = (1L to 5L).map(i => SeqId.encodeFn(i, s"uuid-$i"))
    val feed = ids.toDF("id")
    val compacted = feed.filter(col("id") =!= ids(2)) // event 3 compacted away
    val after = compacted.filter(col("id") > ids(2)).orderBy("id").collect()
    assert(after.map(_.getString(0)).toSeq === Seq(ids(3), ids(4)))
  }

  test("sequence-prefixed id example round-trips (README.md:159)") {
    val spec = "0000001000001::5f8de8ff-30d8-4fab-8f5a-c32f326d6f26"
    assert(SeqId.encodeFn(1000001L, "5f8de8ff-30d8-4fab-8f5a-c32f326d6f26") === spec)
    assert(SeqId.decodeFn(spec) === Some(1000001L))
    // native Column path agrees with the UDF path
    val df = Seq((1000001L, "5f8de8ff-30d8-4fab-8f5a-c32f326d6f26")).toDF("seq", "sfx")
      .select(SeqId.encode(col("seq"), col("sfx")).as("enc"))
      .withColumn("dec", SeqId.decodeSeq(col("enc")))
    val r = df.collect().head
    assert(r.getString(0) === spec)
    assert(r.getLong(1) === 1000001L)
  }

  test("at-least-once redelivery is idempotent under id-dedup (README.md:113-114)") {
    val page = parsePage(inventoryPage)
    val redelivered = page.unionByName(page).dropDuplicates("id")
    assert(redelivered.count() === page.count())
  }

  test("aggregate feed: every subject present at least once, full state kept (README.md:173-174)") {
    val w = Window.partitionBy("subject").orderBy(col("pos").desc)
    val compacted = parsePage(inventoryPage)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(compacted.select("subject").distinct().count() ===
      parsePage(inventoryPage).select("subject").distinct().count())
    // full current state: the data payload of the kept entry is intact
    val kept = compacted.filter(col("subject") === "9521234567899").collect().head
    assert(kept.getAs[org.apache.spark.sql.Row]("data").getAs[Int]("quantity") === 4)
  }
}
