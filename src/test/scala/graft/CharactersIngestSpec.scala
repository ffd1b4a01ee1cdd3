package graft

import graft.etl.{BronzeIngest, ScanGuard}
import graft.core.T
import org.apache.spark.sql.functions._

/** The reference's demo ingest source: the characters API page
  * (`api/characters.json` — nested `origin`/`location` structs and an
  * `episode` string array, crawled at `data-lake-stack.yml:218-226`).
  * Exercises nested-struct access + array functions (F16) end-to-end
  * through the bronze path, plus the scan-bytes guardrail. */
class CharactersIngestSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """{"info":{"count":2,"pages":1},"results":[
      |{"id":1,"name":"Rick","status":"Alive","species":"Human","type":"",
      | "gender":"Male","origin":{"name":"Earth C-137","url":"http://o/1"},
      | "location":{"name":"Citadel","url":"http://l/3"},
      | "image":"http://img/1.jpeg",
      | "episode":["http://ep/1","http://ep/2","http://ep/3"],
      | "url":"http://ch/1","created":"2017-11-04T18:48:46.250Z"},
      |{"id":2,"name":"Morty","status":"Alive","species":"Human","type":"",
      | "gender":"Male","origin":{"name":"unknown","url":""},
      | "location":{"name":"Citadel","url":"http://l/3"},
      | "image":"http://img/2.jpeg",
      | "episode":["http://ep/1","http://ep/2"],
      | "url":"http://ch/2","created":"2017-11-04T18:50:21.651Z"}
      |]}""".stripMargin.replaceAll("\n", "")

  test("characters page: nested structs + episode array through bronze") {
    val bronze = BronzeIngest
      .fromJsonPayloads(spark, Seq(page))
      .select(explode($"results").as("c"))
      .select($"c.id".as("id"), $"c.name".as("name"),
        $"c.origin.name".as("origin"), $"c.location.name".as("location"),
        $"c.episode".as("episode"),
        to_timestamp($"c.created").as("created"))
    val rows = bronze.orderBy($"id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("origin") == "Earth C-137")
    // F16: array functions over the episode list
    val counts = bronze
      .select($"id", size($"episode").as("n_episodes"),
        array_contains($"episode", "http://ep/3").as("in_ep3"))
      .orderBy($"id").collect()
    assert(counts.map(r => (r.getInt(1), r.getBoolean(2))).toSeq ==
      Seq((3, true), (2, false)))
    // characters sharing a location — the crawler-table join demo
    val byLoc = bronze.groupBy($"location").agg(count(lit(1)).as("n"))
      .orderBy($"location").collect()
    assert(byLoc.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("Citadel", 2L)))
  }

  test("scan guard: under-budget passes, tiny budget rejects") {
    val li = T(spark, sf0001, "lineitem")
    assert(ScanGuard.enforce(li).collect().nonEmpty)
    assert(ScanGuard.plannedScanBytes(li) > 0)
    val err = intercept[ScanGuard.ScanBudgetExceeded] {
      ScanGuard.enforce(li, budget = 10L)
    }
    assert(err.planned > 10L)
  }
}
