package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Persists

/** The persisted-relation registry (ADVICE r15): instance reuse across
  * equivalent constructions, alias-safety, and explicit teardown. */
class PersistsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def rel() = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "s")
    .groupBy("s").agg(count(lit(1)).as("n"))

  test("equivalent plans reuse the FIRST persisted instance") {
    val a = Persists.cached(rel())
    val b = Persists.cached(rel())
    assert(a eq b, "a fresh but semantically identical plan must reuse the instance")
    assert(a.storageLevel == StorageLevel.MEMORY_AND_DISK)
    assert(a.collect().length == 2)
  }

  test("a differently-aliased twin is NOT reused (canonicalization erases names)") {
    val a = Persists.cached(rel())
    val renamed = Persists.cached(rel().withColumnsRenamed(Map("n" -> "cnt")))
    assert(!(a eq renamed), "schema names differ - reuse would break resolution")
    assert(renamed.columns.toSeq == Seq("s", "cnt"))
  }

  test("release(session) unpersists and the next call re-registers") {
    val key = Seq((9L, "z")).toDF("id", "s").groupBy("id").agg(max("s").as("m"))
    val a = Persists.cached(key)
    assert(a.storageLevel != StorageLevel.NONE)
    Persists.release(spark)
    assert(a.storageLevel == StorageLevel.NONE, "release must unpersist")
    val b = Persists.cached(Seq((9L, "z")).toDF("id", "s")
      .groupBy("id").agg(max("s").as("m")))
    assert(!(a eq b) && b.storageLevel == StorageLevel.MEMORY_AND_DISK)
    Persists.releaseAll()
  }
}
