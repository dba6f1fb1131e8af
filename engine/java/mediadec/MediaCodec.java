package mediadec;

import java.awt.image.BufferedImage;
import java.awt.image.ColorModel;
import java.awt.image.IndexColorModel;
import java.awt.image.Raster;
import java.io.ByteArrayInputStream;
import java.nio.charset.StandardCharsets;
import java.security.MessageDigest;
import java.util.Arrays;
import javax.imageio.ImageIO;
import javax.sound.sampled.AudioFormat;
import javax.sound.sampled.AudioInputStream;
import javax.sound.sampled.AudioSystem;

/**
 * JVM-native media decode (VERDICT r3 next-round #1): javax.imageio /
 * javax.sound twins of the pure-Python decoders in engine/multimodal.py and
 * engine/jpeg.py. The Python decoders remain the differential ORACLE
 * (fast-path / reference-twin discipline, same as extraction/fastscan.py vs
 * the stdlib HTMLParser path); this class is the production path — payload
 * bytes never leave the JVM, no Arrow hop, native decode speed. At 100 TB of
 * images this removes the per-pixel Python interpreter cost that was the r3
 * verdict's one perf-weak finding.
 *
 * Status contract (deterministic, oracle-SQL-expressible):
 *   "ok"                 — decoded; dims/channels/pixel sha populated
 *   "error:unsupported"  — magic sniff fails (decided BEFORE decoding, the
 *                          same dispatch order as the Python twin)
 *   "error:decode"       — known magic but the decode failed (the Python
 *                          twin distinguishes truncation flavors; the JVM
 *                          path normalizes them so gate oracles stay exact)
 *
 * Pixel layout parity with the Python twin: gray = 1 byte/px raster samples;
 * gray+alpha = 2 interleaved; RGB = 3 interleaved row-major; RGBA = 4.
 * Palette formats (GIF) map through the palette to 3-channel RGB, exactly as
 * engine/multimodal.decode_gif does. Gray rasters are read sample-wise (NOT
 * via getRGB, whose gray->sRGB color transform is not the identity).
 *
 * Reference analog: the load-once native-library pattern of M9/M11
 * (urdu_recognition_utrnet.py:53-96) — decoder state (the ImageIO plugin
 * registry) is JVM-global, initialized once per executor, reused per row.
 */
public final class MediaCodec {
  static {
    ImageIO.setUseCache(false); // no temp-file cache; decode fully in-memory
  }

  private MediaCodec() {}

  private static final char[] HEX = "0123456789abcdef".toCharArray();

  static String sha256Hex(byte[] data) {
    try {
      byte[] d = MessageDigest.getInstance("SHA-256").digest(data);
      StringBuilder sb = new StringBuilder(64);
      for (byte b : d) {
        sb.append(HEX[(b >> 4) & 0xF]).append(HEX[b & 0xF]);
      }
      return sb.toString();
    } catch (Exception e) {
      throw new RuntimeException(e);
    }
  }

  private static boolean isPnm(byte[] p) {
    return p.length >= 2 && p[0] == 'P' && (p[1] == '5' || p[1] == '6');
  }

  private static boolean isKnownImage(byte[] p) {
    if (p == null || p.length < 2) {
      return false;
    }
    if (isPnm(p)) {
      return true;
    }
    // magic checks mirror the Python dispatch exactly (review r4): full
    // 8-byte PNG signature and 6-byte GIF87a/GIF89a, so unknown-magic
    // classification agrees byte-for-byte between the twins
    if (p.length >= 8
        && (p[0] & 0xFF) == 0x89 && p[1] == 'P' && p[2] == 'N' && p[3] == 'G'
        && p[4] == '\r' && p[5] == '\n' && p[6] == 0x1A && p[7] == '\n') {
      return true;
    }
    if (p[0] == 'B' && p[1] == 'M') {
      return true;
    }
    if (p.length >= 6
        && p[0] == 'G' && p[1] == 'I' && p[2] == 'F' && p[3] == '8'
        && (p[4] == '7' || p[4] == '9') && p[5] == 'a') {
      return true;
    }
    return (p[0] & 0xFF) == 0xFF && (p[1] & 0xFF) == 0xD8; // JPEG SOI
  }

  private static final Object[] IMG_UNSUPPORTED =
      new Object[] {"error:unsupported", 0L, 0L, 0L, 0L, ""};
  private static final Object[] IMG_DECODE_ERR =
      new Object[] {"error:decode", 0L, 0L, 0L, 0L, ""};

  /** (payload) -> {status, width, height, channels, n_pixel_bytes, pixel_sha}. */
  public static Object[] decodeImage(byte[] payload) {
    if (!isKnownImage(payload)) {
      return IMG_UNSUPPORTED.clone();
    }
    try {
      int[] dims = new int[3];
      byte[] pix = rasterOf(payload, dims);
      return new Object[] {
        "ok", (long) dims[0], (long) dims[1], (long) dims[2], (long) pix.length, sha256Hex(pix)
      };
    } catch (Exception | AssertionError e) {
      return IMG_DECODE_ERR.clone();
    }
  }

  /** Decode to (dims[w,h,c], interleaved pixel bytes); throws on failure. */
  private static byte[] rasterOf(byte[] payload, int[] dims) throws Exception {
    if (isPnm(payload)) {
      return decodePnm(payload, dims);
    }
    BufferedImage img = ImageIO.read(new ByteArrayInputStream(payload));
    if (img == null) {
      throw new IllegalArgumentException("no ImageIO reader matched");
    }
    int w = img.getWidth();
    int h = img.getHeight();
    int c = channelsOf(img);
    dims[0] = w;
    dims[1] = h;
    dims[2] = c;
    byte[] out = new byte[Math.multiplyExact(w * h, c)];
    if (c <= 2) {
      // gray / gray+alpha: raw raster samples — getRGB would push gray
      // through a non-identity gray->sRGB transform
      Raster r = img.getRaster();
      int k = 0;
      for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
          for (int b = 0; b < c; b++) {
            out[k++] = (byte) r.getSample(x, y, b);
          }
        }
      }
    } else {
      int[] px = img.getRGB(0, 0, w, h, null, 0, w); // exact for RGB/indexed
      int k = 0;
      for (int i = 0; i < px.length; i++) {
        out[k++] = (byte) (px[i] >> 16);
        out[k++] = (byte) (px[i] >> 8);
        out[k++] = (byte) px[i];
        if (c == 4) {
          out[k++] = (byte) (px[i] >>> 24);
        }
      }
    }
    return out;
  }

  private static int channelsOf(BufferedImage img) {
    ColorModel cm = img.getColorModel();
    if (cm instanceof IndexColorModel) {
      return 3; // palette -> RGB, exactly like the Python GIF twin
    }
    return cm.getNumComponents(); // 1 gray, 2 gray+A, 3 RGB, 4 RGBA
  }

  private static boolean isPnmSpace(byte b) {
    return b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0B || b == '\f';
  }

  /** Binary PGM/PPM header+raster, mirroring engine/multimodal._pnm_header
   *  token for token (whitespace runs, '#' comments to EOL, exactly one
   *  whitespace byte before the raster, maxval 255 only). */
  private static byte[] decodePnm(byte[] p, int[] dims) {
    int c = p[1] == '6' ? 3 : 1;
    long[] toks = new long[3];
    int nt = 0;
    int i = 2;
    while (nt < 3) {
      while (i < p.length && isPnmSpace(p[i])) {
        i++;
      }
      if (i < p.length && p[i] == '#') {
        while (i < p.length && p[i] != '\n') {
          i++;
        }
        continue;
      }
      int j = i;
      while (j < p.length && !isPnmSpace(p[j])) {
        j++;
      }
      if (j == i) {
        throw new IllegalArgumentException("truncated header");
      }
      toks[nt++] = Long.parseLong(new String(p, i, j - i, StandardCharsets.US_ASCII));
      i = j;
    }
    int w = Math.toIntExact(toks[0]);
    int h = Math.toIntExact(toks[1]);
    if (w <= 0 || h <= 0 || toks[2] != 255) {
      throw new IllegalArgumentException("bad dims or maxval");
    }
    int off = i + 1;
    int n = Math.multiplyExact(w * h, c);
    if (off + n > p.length) {
      throw new IllegalArgumentException("truncated raster");
    }
    dims[0] = w;
    dims[1] = h;
    dims[2] = c;
    return Arrays.copyOfRange(p, off, off + n);
  }

  private static final Object[] AUDIO_UNSUPPORTED =
      new Object[] {"error:unsupported", 0L, 0L, 0L, 0L};
  private static final Object[] AUDIO_DECODE_ERR = new Object[] {"error:decode", 0L, 0L, 0L, 0L};

  /** (payload) -> {status, sample_rate, channels, n_samples, sum_sq}; 16-bit
   *  PCM WAV via javax.sound, sum_sq the exact integer sum of squared
   *  samples over ALL channels (parity with engine/multimodal.decode_wav). */
  public static Object[] decodeAudio(byte[] payload) {
    if (payload == null
        || payload.length < 12
        || payload[0] != 'R'
        || payload[1] != 'I'
        || payload[2] != 'F'
        || payload[3] != 'F'
        || payload[8] != 'W'
        || payload[9] != 'A'
        || payload[10] != 'V'
        || payload[11] != 'E') {
      return AUDIO_UNSUPPORTED.clone();
    }
    try (AudioInputStream ais =
        AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))) {
      AudioFormat f = ais.getFormat();
      if (f.getEncoding() != AudioFormat.Encoding.PCM_SIGNED || f.getSampleSizeInBits() != 16) {
        return AUDIO_DECODE_ERR.clone();
      }
      byte[] data = ais.readAllBytes();
      int n = data.length / 2;
      int lo = f.isBigEndian() ? 1 : 0;
      int hi = 1 - lo;
      long sumSq = 0;
      for (int i = 0; i < n; i++) {
        int s = (short) (((data[2 * i + hi] & 0xFF) << 8) | (data[2 * i + lo] & 0xFF));
        sumSq += (long) s * s;
      }
      return new Object[] {
        "ok", (long) f.getSampleRate(), (long) f.getChannels(), (long) n, sumSq
      };
    } catch (Exception e) {
      return AUDIO_DECODE_ERR.clone();
    }
  }

  /** (payload, outW, outH) -> {status, out_w, out_h, thumb_sha}: decode (any
   *  supported image format — a superset of the Python twin, which is
   *  PNM-only) then nearest-neighbor resample with the SAME index math as
   *  engine/multimodal._resize_nn_batches: src px = ((ti*h/outH)*w +
   *  (tj*w/outW)) * c. */
  public static Object[] resizeNN(byte[] payload, int outW, int outH) {
    if (!isKnownImage(payload)) {
      return new Object[] {"error:unsupported", (long) outW, (long) outH, ""};
    }
    try {
      int[] dims = new int[3];
      byte[] pix = rasterOf(payload, dims);
      int w = dims[0];
      int h = dims[1];
      int c = dims[2];
      byte[] thumb = new byte[outW * outH * c];
      int k = 0;
      for (int ti = 0; ti < outH; ti++) {
        for (int tj = 0; tj < outW; tj++) {
          int src = ((ti * h / outH) * w + (tj * w / outW)) * c;
          for (int b = 0; b < c; b++) {
            thumb[k++] = pix[src + b];
          }
        }
      }
      return new Object[] {"ok", (long) outW, (long) outH, sha256Hex(thumb)};
    } catch (Exception | AssertionError e) {
      return new Object[] {"error:decode", (long) outW, (long) outH, ""};
    }
  }
}
