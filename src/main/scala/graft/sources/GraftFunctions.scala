package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** V2 FunctionCatalog surface: graft's codegen'd kernels exposed as
  * CATALOG functions — `SELECT graft.db.polyhash(text)` from pure SQL,
  * no session-level temp registration needed (the complement of
  * GraftSqlBridge.registerTempFunction, which is session-scoped).
  *
  * Each BoundFunction DELEGATES to the original Catalyst expression
  * over BoundReferences rather than re-implementing the kernel — the
  * SQL surface and the Column/oracle surface therefore CANNOT drift:
  * one kernel, two entry points. (ScalarFunction's `produceResult`
  * path is interpreted; callers on the hot path use the Column API,
  * which plans the codegen'd expression directly — same results
  * either way, and GraftCatalogSpec pins that equality.)
  */
object GraftFunctions {

  /** name → (expected input types, result type, expression builder
    * over bound references). */
  private case class Spec(
      inputs: Seq[DataType],
      result: DataType,
      build: Seq[Expression] => Expression)

  private val arrD = ArrayType(DoubleType)

  private val specs: Map[String, Spec] = Map(
    "polyhash" -> Spec(Seq(StringType), LongType,
      args => graft.functions.PolyHash(args.head)),
    "simhash" -> Spec(Seq(StringType), LongType,
      args => graft.functions.SimHash(args.head, 30)),
    "fingerprint" -> Spec(Seq(StringType), LongType,
      args => graft.functions.GramFingerprint(args.head, 5)),
    "dot" -> Spec(Seq(arrD, arrD), DoubleType,
      args => graft.functions.DotProduct(args.head, args(1))),
    "z_value" -> Spec(Seq(LongType, LongType), LongType,
      args => graft.functions.ZValue(args.head, args(1), 21)),
    "vec_dhash" -> Spec(Seq(ArrayType(FloatType), LongType), LongType,
      args => graft.functions.VecDHash(args.head, args(1), 0)),
    "pixel_dhash" -> Spec(
      Seq(ArrayType(ArrayType(ArrayType(IntegerType)))), LongType,
      args => graft.functions.PixelDHash(args.head)))

  def names: Seq[String] = specs.keys.toSeq.sorted

  def load(name: String): Option[UnboundFunction] =
    specs.get(name).map(s => new GraftUnboundFunction(name, s.inputs, s.result, s.build))

  private class GraftUnboundFunction(
      fname: String,
      inputs: Seq[DataType],
      result: DataType,
      build: Seq[Expression] => Expression) extends UnboundFunction {

    override def name(): String = fname
    override def description(): String =
      s"graft kernel $fname(${inputs.map(_.simpleString).mkString(", ")}): ${result.simpleString}"

    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == inputs.length,
        s"$fname expects ${inputs.length} arguments, got ${inputType.fields.length}")
      def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
        case (ArrayType(x, _), ArrayType(y, _)) => sameType(x, y)
        case _ => a == b
      }
      inputType.fields.zip(inputs).zipWithIndex.foreach { case ((f, expect), i) =>
        require(sameType(f.dataType, expect),
          s"$fname argument $i: expected ${expect.simpleString}, got ${f.dataType.simpleString}")
      }
      val expr = build(inputs.zipWithIndex.map { case (dt, i) =>
        BoundReference(i, dt, nullable = true)
      })
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] = inputs.toArray
        override def resultType(): DataType = result
        override def name(): String = fname
        override def isResultNullable: Boolean = true
        override def isDeterministic: Boolean = true
        override def produceResult(input: InternalRow): Any = expr.eval(input)
      }
    }
  }
}
