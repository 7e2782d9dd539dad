package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Registry-wide output-schema lint: the driver's correctness gate
  * canonicalizes every query's result in pandas (`sort_values` over every
  * column), which dies on non-atomic cells (`TypeError: unhashable
  * type: 'numpy.ndarray'` — the round-9 st15 failure). So NO compared
  * query may emit an array/map/struct column; nested shapes must be
  * flattened to scalars (CSV via `concat_ws`, or exploded to rows)
  * before they reach the registry. This spec walks every
  * [[SparkEntry.queries]] entry at sf0.001 and fails on the first
  * non-atomic output column — catching the next st15 in `sbt test`
  * instead of in the driver's CORRECTNESS report.
  */
class OutputSchemaSpec extends GraftSuite {

  test("every registry query emits only atomic (comparator-safe) columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        val schema = build(spark, sf).schema
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
                    f.dataType.isInstanceOf[MapType] ||
                    f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"non-atomic output columns break the driver's pandas comparator:\n  " +
        offenders.mkString("\n  "))
  }
}
