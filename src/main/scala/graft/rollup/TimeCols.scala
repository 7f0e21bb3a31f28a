package graft.rollup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Time-column normalization shared by the time-ordered operators
  * (AsOfJoin, Sessionize): accept numeric columns as-is and timestamp
  * columns as epoch-seconds doubles with microsecond precision. ANSI
  * mode (Spark 4 default) forbids a direct TIMESTAMP_NTZ -> DOUBLE
  * cast, so NTZ goes through TIMESTAMP (session-timezone
  * interpretation) first.
  */
private[rollup] object TimeCols {
  def epochSeconds(df: DataFrame, timeCol: String): Column =
    df.schema(timeCol).dataType match {
      case TimestampNTZType => col(timeCol).cast("timestamp").cast("double")
      case TimestampType    => col(timeCol).cast("double")
      case _                => col(timeCol).cast("double")
    }
}
