package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Shared input checks for the operator kernels. */
private[graft] object OpChecks {

  /** The typed kernels cast id columns to long — fail fast on non-integral
    * ids instead of surfacing as a null-decoding error mid-job.
    */
  def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    val dt = df.schema(idCol).dataType
    require(Set[DataType](ByteType, ShortType, IntegerType, LongType)(dt),
      s"$idCol must be an integral type (got ${dt.simpleString})")
  }

  /** SQL-semantics trim: strips SPACES only, exactly like Spark's `trim()`
    * Column function and DuckDB's `trim()` — NOT Java's String.trim, which
    * also strips tabs/newlines/control chars and would silently diverge
    * the typed kernels from their Column forms and SQL oracles on text
    * with leading/trailing whitespace other than ' '.
    */
  def sqlTrim(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }
}
