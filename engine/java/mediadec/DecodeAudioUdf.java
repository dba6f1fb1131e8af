package mediadec;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF1;

/** Spark-registrable wrapper: payload binary -> WAV decode struct. */
public final class DecodeAudioUdf implements UDF1<byte[], Row> {
  @Override
  public Row call(byte[] payload) {
    return RowFactory.create(MediaCodec.decodeAudio(payload));
  }
}
