package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.core.T(spark, sf0001, "documents")

  test("CMS never undercounts and reports the exact top-k, ordered") {
    val out = TextOps.countMinAudit(docs).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getAs[Long]("cm_estimate") >= r.getAs[Long]("exact_count"),
        s"CMS undercounted ${r.getAs[String]("token")}")
      assert(r.getAs[Long]("overestimate") ==
        r.getAs[Long]("cm_estimate") - r.getAs[Long]("exact_count"))
    }
    val exacts = out.map(_.getAs[Long]("exact_count")).toSeq
    assert(exacts == exacts.sortBy(-_), "not ordered by exact count desc")
  }

  test("width-1 degenerate: every estimate collapses to the total token count") {
    val n = docs
      .select(explode(graft.operators.DedupOps.tokens($"text")).as("t"))
      .count()
    TextOps.countMinAudit(docs, depth = 2, width = 1, topK = 5).collect()
      .foreach(r => assert(r.getAs[Long]("cm_estimate") == n))
  }

  test("sketch dims are validated") {
    intercept[IllegalArgumentException] {
      TextOps.countMinAudit(docs, depth = 0)
    }
  }
}
