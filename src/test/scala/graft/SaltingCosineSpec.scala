package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity
import graft.operators.Salting
import graft.queries.{SimilarityOps, TimeSeries}

class SaltingCosineSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfSmoke}

  test("salted join equals the plain join") {
    val e = Tables.t(spark, sfSmoke, "events")
    val dim = e.select(col("event_type")).distinct()
      .withColumn("type_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("event_type"))))
    val plain = e.join(dim, Seq("event_type"))
      .select(col("event_id"), col("type_id"))
    val salted = Salting.saltedJoin(e, dim, "event_type", "event_id", 8)
      .select(col("event_id"), col("type_id"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("skew profile identifies the heaviest key with correct share") {
    val prof = Salting.keySkewProfile(
      Tables.t(spark, sfSmoke, "events"), "event_type").collect()
    assert(prof.length == 5)
    assert(math.abs(prof.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
  }

  test("native cosine expression is bit-identical to the composed form") {
    val e = Tables.t(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(100)
    CosineSimilarity.register(spark)
    val a = e.alias("a")
    val b = e.alias("b")
    val pairs = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(
        call_function(CosineSimilarity.FnName,
          col("a.v"), col("b.v")).as("native"),
        SimilarityOps.cosineComposed(col("a.v"), col("b.v")).as("composed"))
    assert(pairs.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("garch backtest produces finite positive losses per key") {
    val rows = TimeSeries.queries("ts_garch_backtest")(spark, sfSmoke).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(1) > 0 && !r.getDouble(1).isNaN, "var_mae")
      assert(r.getDouble(2) >= r.getDouble(1) * 0.5, "rmse >= mae/2 sanity")
      assert(r.getDouble(3) > 0 && !r.getDouble(3).isInfinite, "qlike")
      assert(r.getAs[Long]("n_folds") == 5)
    }
  }
}
