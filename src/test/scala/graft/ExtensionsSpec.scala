package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions registration path: a session built with
  * graft.GraftExtensions can call every native function from SQL. */
class ExtensionsSpec extends SparkSpecBase {

  test("GraftExtensions injects all native functions for SQL users") {
    val prev = spark // keep the shared session alive for other suites
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions()).getOrCreate()
    try {
      val c = s2.sql(
        """SELECT graft_cosine(array(cast(3.0 as float), cast(0.0 as float)),
          |                    array(cast(3.0 as float), cast(0.0 as float))) AS c
          |""".stripMargin).collect()(0).getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
      val sh = s2.sql("SELECT graft_shingles('a b c d', 3) AS sh")
        .collect()(0).getSeq[String](0)
      assert(sh == Seq("a b c", "b c d"))
      assert(s2.sql(
        """SELECT graft_rhp_bucket(array(cast(1.0 as float)), 2, 1, 1000) AS b
          |""".stripMargin).collect()(0).getLong(0) >= 0L)
      val top = s2.sql(
        """SELECT graft_topk(struct(cast(v as double), cast(v as bigint)), 2) AS t
          |FROM VALUES (1), (5), (3), (4) AS tab(v)
          |""".stripMargin).collect()(0).getSeq[org.apache.spark.sql.Row](0)
      assert(top.map(_.getLong(1)) == Seq(5L, 4L))
      val ng = s2.sql("SELECT graft_ngrams('a b a b', 2) AS g")
        .collect()(0).getSeq[String](0)
      assert(ng == Seq("a b", "b a", "a b"))
      val gs = s2.sql("SELECT graft_gram_stats('a b a b', 2) AS s")
        .collect()(0).getStruct(0)
      assert((gs.getLong(0), gs.getLong(1), gs.getLong(2)) == ((3L, 2L, 2L)))
    } finally {
      // do NOT stop s2 — it shares the JVM's SparkContext with the other
      // suites; just restore the shared session handles
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
