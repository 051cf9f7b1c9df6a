package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.OracleSafe._

/** The reference's four analytics views (/root/reference/sql/03_views.sql)
  * re-expressed on the testdata star schema per the SURVEY.md §1 mapping:
  * actors→suppliers, genres→brands, movies→orders, junctions→lineitem.
  *
  * Every dimension join goes through [[Hints.maybeBroadcast]]: at
  * small scale the dim broadcasts (the fact table never shuffles for
  * the join; only the final partial aggregation exchanges data), but
  * the hint is size-guarded — TPC-H dims grow linearly with scale
  * factor, and an unconditional broadcast() of a grown dim is a
  * driver OOM at the 100 TB design point (see Hints scaladoc).
  */
object Views {

  /** v_top_actors (03_views.sql:4-13): entity ranked by
    * COUNT(DISTINCT junction rows) — suppliers by distinct orders.
    */
  def topActors(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
    val li  = Tables.lineitem(s, dir)
    li.join(Hints.maybeBroadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(countDistinct(col("l_orderkey")).as("movie_count"))
      .orderBy(col("movie_count").desc, col("s_name"))
  }

  /** v_top_genres (03_views.sql:17-26): category ranked by
    * COUNT(DISTINCT junction rows) — brands by distinct orders.
    */
  def topGenres(s: SparkSession, dir: String): DataFrame = {
    val p  = Tables.part(s, dir)
    val li = Tables.lineitem(s, dir)
    li.join(Hints.maybeBroadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand").as("genre_name"))
      .agg(countDistinct(col("l_orderkey")).as("movie_count"))
      .orderBy(col("movie_count").desc, col("genre_name"))
  }

  /** v_genre_ratings (03_views.sql:30-43): 3-way join + AVG/SUM per
    * category. avg via OracleSafe.avg2 (exact integer-cent arithmetic,
    * deterministic under any partitioning).
    */
  def genreRatings(s: SparkSession, dir: String): DataFrame = {
    val p  = Tables.part(s, dir)
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    li.join(Hints.maybeBroadcast(p), li("l_partkey") === p("p_partkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("p_brand").as("genre_name"))
      .agg(
        countDistinct(col("o_orderkey")).as("movies_in_genre"),
        avg2(col("o_totalprice")).as("avg_rating"),
        sumLong(col("l_quantity")).as("total_votes"),
        avg2(col("l_extendedprice")).as("avg_popularity"))
      .orderBy(col("avg_rating").desc, col("movies_in_genre").desc, col("genre_name"))
  }

  /** v_top_actors_by_rating (03_views.sql:47-61): 3-way join + HAVING
    * floor + multi-key ordering — suppliers by average order value.
    */
  def topActorsByRating(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
    val li  = Tables.lineitem(s, dir)
    val o   = Tables.orders(s, dir)
    li.join(Hints.maybeBroadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(
        countDistinct(col("o_orderkey")).as("movie_count"),
        avg2(col("o_totalprice")).as("avg_movie_rating"),
        sumLong(col("l_quantity")).as("total_votes"))
      .filter(col("movie_count") >= 3)
      .orderBy(col("avg_movie_rating").desc, col("movie_count").desc,
               col("total_votes").desc, col("s_suppkey"))
  }
}
