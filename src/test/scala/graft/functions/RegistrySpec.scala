package graft.functions

import graft.SparkTestBase

class RegistrySpec extends SparkTestBase {

  test("custom expressions callable from SQL") {
    Registry.registerAll(spark)
    val row = spark.sql(
      """SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw,
                poly_hash('hello world') AS ph,
                vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                        array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dp,
                sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS n
      """).collect()(0)
    assert(row.getAs[Double]("jw") === 0.9611111111111111)
    assert(row.getAs[Long]("ph") === PolyHash.hash("hello world"))
    assert(row.getAs[Double]("dp") === 11.0)
    assert(row.getAs[Int]("n") === 2)
  }
}
