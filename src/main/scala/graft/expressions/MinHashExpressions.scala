package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature: for each of `k` seeded permutations, the
  * lexicographic minimum of md5hex(seed ":" shingle) over the shingle set —
  * byte-identical to the composed built-in form
  * `array(array_min(transform(sh, s => md5(seed:s))) ...)` and to the SQL
  * oracle `list_min([md5('h:' || x) for x in sh])`, but one tight loop per
  * row instead of k interpreted higher-order passes allocating k arrays.
  *
  * CodegenFallback: the kernel cost is the MD5s themselves; falling out of
  * whole-stage codegen for this one projection costs a row copy while the
  * loop runs ~k× fewer expression-tree evaluations.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects (array<string>, k > 0), got ($t, $k)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val minima = new Array[String](k)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i).toString
      var h = 0
      while (h < k) {
        val hex = md5Hex(md, h + ":" + s)
        if (minima(h) == null || hex.compareTo(minima(h)) < 0) minima(h) = hex
        h += 1
      }
      i += 1
    }
    // empty shingle set → array of nulls, matching array_min over empty
    ArrayData.toArrayData(minima.map(m => if (m == null) null else UTF8String.fromString(m)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFunctions {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        // k must be a foldable int literal — anything else fails analysis
        // with the signature, not an opaque ClassCastException at eval
        def bad() = throw new org.apache.spark.sql.AnalysisException(
          errorClass = "INTERNAL_ERROR",
          messageParameters = Map("message" ->
            "graft_minhash expects (array<string> shingles, int-literal k)"))
        if (children.size != 2 || !children(1).foldable) bad()
        children(1).eval() match {
          case k: Integer => MinHashSignature(children.head, k)
          case _ => bad()
        }
      })
}
