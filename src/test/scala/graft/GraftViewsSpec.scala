package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Views
import graft.sql.GraftViews

/** The SQL view surface and the DataFrame operator surface are the
  * same engine: every `v_*` view must produce byte-identical rows to
  * its DataFrame twin (the reference's users consume these AS SQL —
  * /root/reference/sql/03_views.sql — so the SQL door is the
  * compatibility contract, not a convenience).
  */
class GraftViewsSpec extends AnyFunSuite with SparkFixture {

  test("all four reference views: SQL surface == DataFrame surface, row for row") {
    GraftViews.registerAll(spark, sf)
    val pairs = Seq(
      "v_top_actors"           -> Views.topActors(spark, sf),
      "v_top_genres"           -> Views.topGenres(spark, sf),
      "v_genre_ratings"        -> Views.genreRatings(spark, sf),
      "v_top_actors_by_rating" -> Views.topActorsByRating(spark, sf))
    pairs.foreach { case (view, dfSide) =>
      val sqlSide = GraftViews.query(spark, view)
      assert(sqlSide.columns.toSeq == dfSide.columns.toSeq, s"$view: column mismatch")
      assert(sqlSide.exceptAll(dfSide).count() == 0 && dfSide.exceptAll(sqlSide).count() == 0,
        s"$view: SQL and DataFrame surfaces disagree")
    }
  }

  test("SQL users can call the injected graft functions directly") {
    GraftViews.registerAll(spark, sf)
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val n = spark.sql(
      """SELECT vec_id, graft_cosine(embedding, embedding) AS self_cos
         FROM embeddings LIMIT 5""").collect()
    assert(n.length == 5 && n.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("unknown view name fails loudly") {
    intercept[IllegalArgumentException] { GraftViews.query(spark, "v_nope") }
  }
}
