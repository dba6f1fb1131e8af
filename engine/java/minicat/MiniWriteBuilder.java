package minicat;

import java.util.ArrayList;
import java.util.List;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.SupportsTruncate;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.StructType;

/**
 * Batch write: task writers buffer deep-copied rows and ship them back in
 * the commit message; the driver-side commit appends (INSERT INTO) or
 * replaces (truncate/overwrite, and the row-level MERGE write — the scan
 * read the whole table as one group, so the replacement is the whole table).
 *
 * Row-level quirk (empirically pinned by tests/test_tableio.py): when a
 * connector declares no requiredMetadataAttributes, Spark's ReplaceDataExec
 * picks the plain DataWritingSparkTask and skips the ReplaceDataProjections
 * row projection, so MERGE feeds the writer the raw MergeRows output —
 * [__row_operation, ...table columns]. The row-level writer therefore strips
 * one leading column when the incoming arity is tableSchema+1.
 */
public class MiniWriteBuilder implements WriteBuilder, SupportsTruncate {
  private final String key;
  private final StructType tableSchema;
  private final boolean rowLevel;
  private boolean replace;

  MiniWriteBuilder(String key, StructType tableSchema, boolean rowLevel, boolean replace) {
    this.key = key;
    this.tableSchema = tableSchema;
    this.rowLevel = rowLevel;
    this.replace = replace;
  }

  @Override
  public WriteBuilder truncate() {
    this.replace = true;
    return this;
  }

  @Override
  public Write build() {
    final String k = key;
    final boolean r = replace;
    final StructType s = tableSchema;
    final boolean rl = rowLevel;
    return new Write() {
      @Override
      public BatchWrite toBatch() {
        return new MiniBatchWrite(k, r, s, rl);
      }
    };
  }

  static class MiniBatchWrite implements BatchWrite {
    private final String key;
    private final boolean replace;
    private final StructType tableSchema;
    private final boolean rowLevel;

    MiniBatchWrite(String key, boolean replace, StructType tableSchema, boolean rowLevel) {
      this.key = key;
      this.replace = replace;
      this.tableSchema = tableSchema;
      this.rowLevel = rowLevel;
    }

    @Override
    public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      return new MiniWriterFactory(tableSchema, rowLevel);
    }

    @Override
    public void commit(WriterCommitMessage[] messages) {
      List<InternalRow> all = new ArrayList<>();
      for (WriterCommitMessage m : messages) {
        all.addAll(((MiniCommitMessage) m).rows);
      }
      if (replace) {
        MiniStore.replace(key, all);
      } else {
        MiniStore.append(key, all);
      }
    }

    @Override
    public void abort(WriterCommitMessage[] messages) {}
  }

  static class MiniWriterFactory implements DataWriterFactory {
    private final StructType tableSchema;
    private final boolean rowLevel;

    MiniWriterFactory(StructType tableSchema, boolean rowLevel) {
      this.tableSchema = tableSchema;
      this.rowLevel = rowLevel;
    }

    @Override
    public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
      final int n = tableSchema.size();
      final DataType[] types = new DataType[n];
      for (int i = 0; i < n; i++) {
        types[i] = tableSchema.fields()[i].dataType();
      }
      return new DataWriter<InternalRow>() {
        private final ArrayList<InternalRow> buf = new ArrayList<>();

        @Override
        public void write(InternalRow row) {
          if (rowLevel && row.numFields() == n + 1) {
            // raw MergeRows output: drop the leading __row_operation column.
            // copy() first so extracted strings/binaries reference a
            // self-contained buffer, not the task's reused row.
            InternalRow c = row.copy();
            Object[] vals = new Object[n];
            for (int i = 0; i < n; i++) {
              vals[i] = c.isNullAt(i + 1) ? null : c.get(i + 1, types[i]);
            }
            buf.add(new GenericInternalRow(vals));
          } else {
            buf.add(row.copy());
          }
        }

        @Override
        public WriterCommitMessage commit() {
          return new MiniCommitMessage(new ArrayList<>(buf));
        }

        @Override
        public void abort() {
          buf.clear();
        }

        @Override
        public void close() {}
      };
    }
  }

  static class MiniCommitMessage implements WriterCommitMessage {
    final ArrayList<InternalRow> rows;

    MiniCommitMessage(ArrayList<InternalRow> rows) {
      this.rows = rows;
    }
  }
}
