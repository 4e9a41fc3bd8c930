package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Store body codec (reference `FsCodec.Encoding.OfBlob/ToBlob` +
  * per-store `toNativeEventBody` mapping, CosmosStoreSink.fs:33-36):
  * deflate-compress/decompress of opaque event bodies, as custom
  * Catalyst expressions so they compose inside plans without a UDF's
  * serialization overhead.
  *
  * CodegenFallback is acceptable here: the compression call dominates
  * the virtual-call cost, and the expressions sit at plan boundaries
  * (ingest/egress), not in hot relational loops.
  */
object BodyCodec {

  case class DeflateCompress(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any = {
      val input = v.asInstanceOf[Array[Byte]]
      val deflater = new Deflater(Deflater.BEST_SPEED)
      deflater.setInput(input); deflater.finish()
      val out = new ByteArrayOutputStream(math.max(32, input.length / 2))
      val buf = new Array[Byte](4096)
      while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      out.toByteArray
    }
    override protected def withNewChildInternal(c: Expression): DeflateCompress = copy(c)
  }

  case class DeflateDecompress(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any = {
      val input = v.asInstanceOf[Array[Byte]]
      val inflater = new Inflater()
      inflater.setInput(input)
      val out = new ByteArrayOutputStream(math.max(32, input.length * 2))
      val buf = new Array[Byte](4096)
      var done = inflater.finished()
      while (!done) {
        val n = inflater.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        done = inflater.finished()
        if (!done && n == 0 && inflater.needsInput())
          sys.error("truncated deflate input")
      }
      inflater.end()
      out.toByteArray
    }
    override protected def withNewChildInternal(c: Expression): DeflateDecompress = copy(c)
  }

  def compressBody(c: Column): Column =
    ColumnBridge.column(DeflateCompress(ColumnBridge.expression(c)))
  def decompressBody(c: Column): Column =
    ColumnBridge.column(DeflateDecompress(ColumnBridge.expression(c)))

  /** Register SQL functions `deflate(col)` / `inflate(col)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate", exprs => DeflateCompress(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "inflate", exprs => DeflateDecompress(exprs.head), "built-in")
  }
}
