package mediadec;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF3;

/** Spark-registrable wrapper: (payload, out_w, out_h) -> NN-thumbnail struct. */
public final class ResizeNNUdf implements UDF3<byte[], Integer, Integer, Row> {
  @Override
  public Row call(byte[] payload, Integer outW, Integer outH) {
    return RowFactory.create(MediaCodec.resizeNN(payload, outW, outH));
  }
}
