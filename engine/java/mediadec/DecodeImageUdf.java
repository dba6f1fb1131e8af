package mediadec;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF1;

/** Spark-registrable wrapper: payload binary -> decode struct (MediaCodec). */
public final class DecodeImageUdf implements UDF1<byte[], Row> {
  @Override
  public Row call(byte[] payload) {
    return RowFactory.create(MediaCodec.decodeImage(payload));
  }
}
