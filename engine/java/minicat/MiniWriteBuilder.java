package minicat;

import java.util.ArrayList;
import java.util.List;
import java.util.function.Supplier;

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
 * the commit message; the driver-side commit appends (INSERT INTO),
 * replaces (truncate/overwrite), or — for row-level MERGE/UPDATE/DELETE —
 * replaces exactly the storage groups the shared row-level scan retained
 * after runtime group filtering (r4; see MiniStore.replaceGroups).
 *
 * Incoming rows are projected to the table schema BY NAME against the
 * logical write schema (r4): the MERGE write plan carries extra columns
 * (__row_operation, the _group metadata attribute) whose order is a Spark
 * implementation detail, so positional stripping (the r3 heuristic) is
 * replaced by resolving each table column's index in info.schema(); writes
 * whose schema lacks a table column fall back to positional mapping.
 */
public class MiniWriteBuilder implements WriteBuilder, SupportsTruncate {
  private final String key;
  private final StructType tableSchema;
  private final StructType writeSchema;
  private final boolean rowLevel;
  private final Supplier<int[]> retainedGroups; // non-null only for row-level
  private boolean replace;

  MiniWriteBuilder(
      String key,
      StructType tableSchema,
      StructType writeSchema,
      boolean rowLevel,
      Supplier<int[]> retainedGroups) {
    this.key = key;
    this.tableSchema = tableSchema;
    this.writeSchema = writeSchema;
    this.rowLevel = rowLevel;
    this.retainedGroups = retainedGroups;
    this.replace = rowLevel;
  }

  @Override
  public WriteBuilder truncate() {
    this.replace = true;
    return this;
  }

  @Override
  public Write build() {
    final boolean r = replace;
    return new Write() {
      @Override
      public BatchWrite toBatch() {
        return new MiniBatchWrite(r);
      }
    };
  }

  class MiniBatchWrite implements BatchWrite {
    private final boolean replaceAll;

    MiniBatchWrite(boolean replaceAll) {
      this.replaceAll = replaceAll;
    }

    @Override
    public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      // r7 column mapping: writers emit STORAGE rows — schema field i
      // lands in slot colMap[i]; orphaned (dropped) slots stay null
      return new MiniWriterFactory(
          tableSchema, writeSchema,
          MiniStore.colMapAt(key, null), MiniStore.storageWidth(key));
    }

    @Override
    public void commit(WriterCommitMessage[] messages) {
      List<InternalRow> all = new ArrayList<>();
      for (WriterCommitMessage m : messages) {
        all.addAll(((MiniCommitMessage) m).rows);
      }
      if (rowLevel) {
        MiniStore.replaceGroups(key, retainedGroups.get(), all);
      } else if (replaceAll) {
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
    private final StructType writeSchema;
    private final int[] colMap;
    private final int width;

    MiniWriterFactory(
        StructType tableSchema, StructType writeSchema, int[] colMap, int width) {
      this.tableSchema = tableSchema;
      this.writeSchema = writeSchema;
      this.colMap = colMap;
      this.width = width;
    }

    @Override
    public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
      final int n = tableSchema.size();
      final DataType[] types = new DataType[n];
      final int[] srcIdx = new int[n];
      boolean byName = true;
      for (int i = 0; i < n; i++) {
        types[i] = tableSchema.fields()[i].dataType();
        String name = tableSchema.fields()[i].name();
        int j = -1;
        if (writeSchema != null) {
          for (int k = 0; k < writeSchema.size(); k++) {
            if (writeSchema.fields()[k].name().equals(name)) {
              j = k;
              break;
            }
          }
        }
        srcIdx[i] = j;
        if (j < 0) {
          byName = false;
        }
      }
      final boolean resolveByName = byName;
      return new DataWriter<InternalRow>() {
        private final ArrayList<InternalRow> buf = new ArrayList<>();

        private InternalRow toStorage(InternalRow c, int base) {
          // schema order -> storage slots; orphaned slots stay null
          Object[] vals = new Object[width];
          for (int i = 0; i < n; i++) {
            int src = base < 0 ? srcIdx[i] : i + base;
            vals[colMap[i]] = c.isNullAt(src) ? null : c.get(src, types[i]);
          }
          return new GenericInternalRow(vals);
        }

        @Override
        public void write(InternalRow row) {
          // copy() first so extracted strings/binaries reference a
          // self-contained buffer, not the task's reused row
          InternalRow c = row.copy();
          if (resolveByName) {
            buf.add(toStorage(c, -1));
          } else if (c.numFields() == n + 1) {
            // positional fallback: raw MergeRows output with a leading
            // __row_operation column (pre-r4 shape, kept for safety)
            buf.add(toStorage(c, 1));
          } else {
            buf.add(toStorage(c, 0));
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
