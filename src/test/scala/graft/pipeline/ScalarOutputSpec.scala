package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The driver's correctness harness round-trips every oracle-checked
  * output through pandas and sorts rows by all columns — a cell holding a
  * numpy ndarray is unhashable there and the whole entry records `err`
  * instead of pass/fail (CORRECTNESS_r05: s_quantize). So the registry
  * contract is: any query with an oracleSql entry emits only scalar-typed
  * columns (nested payloads go through `array_join`/explode first). This
  * spec pins that contract so a new operator can't silently reintroduce
  * an array-typed driver-compared column.
  */
class ScalarOutputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every oracle-checked query emits only scalar-typed columns") {
    val oracled = graft.SparkEntry.oracleSql.keySet
    for ((name, fn) <- graft.SparkEntry.queries if oracled(name)) {
      val schema =
        try fn(spark, dir).schema
        finally {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        }
      val nested = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType]
          || f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
      }
      assert(nested.isEmpty,
        s"$name emits non-scalar driver-compared columns (${nested.mkString(", ")}); " +
          "the driver's pandas sort would err on them — array_join or explode first")
    }
  }
}
