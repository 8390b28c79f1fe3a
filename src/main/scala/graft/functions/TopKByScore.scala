package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score DESC, id ASC) pairs
  * per group in a fixed-size buffer that partial-aggregates — map-side
  * combine ships at most k rows per group per partition, where the
  * row_number-window form must shuffle EVERY candidate row and sort each
  * group. This is the scale-correct per-query top-k for kNN/ANN.
  *
  * Input: struct(score: double, id: bigint). Output: array of the same
  * struct, sorted (score DESC, id ASC) — identical row set and order to
  * `row_number() over (order by score desc, id) <= k`.
  */
case class TopKByScore(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  private val elemType = StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
      if a.dataType == DoubleType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects struct<double, bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  /** (score DESC, id ASC): a beats b if higher score, or equal score and
    * lower id. */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def add(buf: ArrayBuffer[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.length < k) {
      buf += e
    } else {
      // replace the current worst if e beats it
      var worst = 0
      var i = 1
      while (i < buf.length) { if (beats(buf(worst), buf(i))) worst = i; i += 1 }
      if (beats(e, buf(worst))) buf(worst) = e
    }
  }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow):
      ArrayBuffer[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        add(buf, (row.getDouble(0), row.getLong(1)))
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val sorted = buf.sortWith(beats)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(child = newChildren.head)
}

object TopKByScore {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk",
      exprs => TopKByScore(exprs(0), ExprArgs.int(exprs(1))),
      "built-in")

  /** Column-API entry: `graft_topk(struct(score, id), k)`. */
  def apply(spark: SparkSession, scoreAndId: Column, k: Int): Column = {
    register(spark)
    call_function("graft_topk", scoreAndId, lit(k))
  }
}
