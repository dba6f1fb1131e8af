package mediadec;

import java.awt.image.BufferedImage;
import java.io.ByteArrayInputStream;
import javax.imageio.ImageIO;
import javax.imageio.ImageReader;
import javax.imageio.stream.MemoryCacheImageInputStream;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF1;

/**
 * JVM twin of engine.multimodal.gif_frames (r4): animated-GIF demux via
 * ImageIO's GIF reader — one struct per frame, frames read as encoded
 * (descriptor-sized rasters, palette-mapped to RGB, no disposal
 * compositing; identical semantics to the pure-Python demux, pinned by
 * tests/test_mediadec_jvm.py). Corrupt payloads yield a single error row
 * (the Python twin keeps the decoded prefix — a documented divergence:
 * ImageIO counts frames up front, so a truncated container fails whole).
 */
public final class GifFramesUdf implements UDF1<byte[], Row[]> {
  private static final Row[] UNSUPPORTED =
      new Row[] {RowFactory.create(0L, "error:unsupported", 0L, 0L, 0L, "")};

  @Override
  public Row[] call(byte[] payload) {
    if (payload == null
        || payload.length < 6
        || payload[0] != 'G'
        || payload[1] != 'I'
        || payload[2] != 'F'
        || payload[3] != '8'
        || (payload[4] != '7' && payload[4] != '9')
        || payload[5] != 'a') {
      return UNSUPPORTED.clone();
    }
    ImageReader reader = null;
    try {
      reader = ImageIO.getImageReadersByFormatName("gif").next();
      reader.setInput(
          new MemoryCacheImageInputStream(new ByteArrayInputStream(payload)), false, false);
      int n = reader.getNumImages(true);
      Row[] out = new Row[n];
      for (int i = 0; i < n; i++) {
        BufferedImage img = reader.read(i);
        int w = img.getWidth();
        int h = img.getHeight();
        byte[] rgb = new byte[w * h * 3];
        int[] px = img.getRGB(0, 0, w, h, null, 0, w);
        int k = 0;
        for (int p = 0; p < px.length; p++) {
          rgb[k++] = (byte) (px[p] >> 16);
          rgb[k++] = (byte) (px[p] >> 8);
          rgb[k++] = (byte) px[p];
        }
        out[i] =
            RowFactory.create(
                (long) i, "ok", (long) w, (long) h, (long) rgb.length,
                MediaCodec.sha256Hex(rgb));
      }
      return out;
    } catch (Exception | AssertionError e) {
      return new Row[] {RowFactory.create(0L, "error:decode", 0L, 0L, 0L, "")};
    } finally {
      if (reader != null) {
        reader.dispose();
      }
    }
  }
}
