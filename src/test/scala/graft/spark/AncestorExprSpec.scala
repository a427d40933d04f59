package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.dggs.{Z3, Z4, Z7, T4, D4}

/** The round-9 native ancestor expressions must agree bit-for-bit with
  * the codec functions they replace in the hot rollup paths, and must
  * plan without any ScalaUDF (verdict #6: promote the hex rollup key
  * derivation to codegen).
  */
class AncestorExprSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def cellsDf(ids: Seq[Long]) = {
    val s = spark
    import s.implicits._
    ids.toDF("cell_id")
  }

  test("hex/quat2 ancestorAtExpr == codec ancestorAt over sampled cells") {
    val rnd = new scala.util.Random(7)
    // Z3: random digit paths on quad + cap bases at res 0..8
    val z3Cells = (0 until 200).map { _ =>
      val base = rnd.nextInt(12)
      val res = rnd.nextInt(9)
      val digits = Seq.fill(res)(if (base == 0 || base == 11) 0 else rnd.nextInt(3))
      Z3.pack(base, digits)
    }
    val z4Cells = (0 until 200).map { _ =>
      val base = rnd.nextInt(12)
      val res = rnd.nextInt(9)
      val digits = Seq.fill(res)(if (base == 0 || base == 11) 0 else rnd.nextInt(4))
      Z4.pack(base, digits)
    }
    val t4Cells = (0 until 200).map { _ =>
      T4.pack(rnd.nextInt(20), Seq.fill(rnd.nextInt(9))(rnd.nextInt(4)))
    }
    val d4Cells = (0 until 200).map { _ =>
      D4.pack(1 + rnd.nextInt(10), Seq.fill(rnd.nextInt(9))(rnd.nextInt(4)))
    }
    val z7Cells = (0 until 200).map { _ =>
      Z7.pack(rnd.nextInt(12), Seq.fill(rnd.nextInt(9))(rnd.nextInt(7)))
    }
    def check(label: String, cells: Seq[Long],
              exprF: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
                org.apache.spark.sql.Column,
              refF: (Long, Int) => Long,
              resOf: Long => Int): Unit =
      for (r <- 0 to 8) {
        val valid = cells.filter(resOf(_) >= r)
        val got = cellsDf(valid)
          .select(exprF(col("cell_id"), lit(r)).as("a"))
          .collect().map(_.getLong(0)).toSeq
        val want = valid.map(refF(_, r))
        assert(got == want, s"$label ancestorAt($r)")
      }
    check("z3", z3Cells, Z3Functions.z3AncestorAtExpr, Z3.ancestorAt, Z3.resolution)
    check("z4", z4Cells, Z4Functions.z4AncestorAtExpr, Z4.ancestorAt, Z4.resolution)
    check("z43", z4Cells, Z43Functions.z43AncestorAtExpr, Z4.ancestorAt, Z4.resolution)
    check("t4", t4Cells, T4Functions.t4AncestorAtExpr, T4.ancestorAt, T4.resolution)
    check("d4", d4Cells, D4Functions.d4AncestorAtExpr, D4.ancestorAt, D4.resolution)
    check("z7", z7Cells, DggsFunctions.z7AncestorAtExpr, Z7.ancestorAt, Z7.resolution)
  }

  test("ancestor rollup key plans with no ScalaUDF (codegen bit math)") {
    val df = cellsDf(Seq(Z3.pack(5, Seq(1, 2, 0))))
      .groupBy(Z3Functions.z3AncestorAtExpr(col("cell_id"), lit(2)).as("a"))
      .agg(count(lit(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan.take(2000))
    val t4df = cellsDf(Seq(T4.pack(5, Seq(1, 2, 0))))
      .groupBy(T4Functions.t4AncestorAtExpr(col("cell_id"), lit(2)).as("a"))
      .agg(count(lit(1)))
    val t4plan = t4df.queryExecution.executedPlan.toString
    assert(!t4plan.contains("ScalaUDF"), t4plan.take(2000))
  }
}
