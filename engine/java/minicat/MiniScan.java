package minicat;

import java.util.ArrayList;
import java.util.Iterator;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;

/**
 * Group-per-partition scan (r4): one input partition per storage group —
 * the in-memory analog of one Iceberg data file per scan task — over a
 * consistent snapshot of the group lists (current, or a pinned
 * {@code VERSION AS OF} snapshot). Supports column pruning and the
 * {@code _group} metadata column (the group id, Iceberg's {@code _file}
 * analog), which the runtime group-filtering rule uses to prune MERGE
 * rewrites to matched groups only.
 */
public class MiniScan implements ScanBuilder, Scan, Batch, SupportsPushDownRequiredColumns {
  protected final String key;
  protected final StructType tableSchema;
  protected final Long snapshotId;
  private StructType readSchema;

  MiniScan(String key, StructType tableSchema, Long snapshotId) {
    this.key = key;
    this.tableSchema = tableSchema;
    this.snapshotId = snapshotId;
    this.readSchema = tableSchema;
  }

  @Override
  public void pruneColumns(StructType requiredSchema) {
    this.readSchema = requiredSchema;
  }

  @Override
  public Scan build() {
    return this;
  }

  @Override
  public StructType readSchema() {
    return readSchema;
  }

  @Override
  public Batch toBatch() {
    return this;
  }

  /** Row-level subclass narrows this after runtime group filtering. */
  protected boolean groupRetained(int g) {
    return true;
  }

  @Override
  public InputPartition[] planInputPartitions() {
    // projection: read-schema field -> table column index, or -1 = _group
    StructField[] fields = readSchema.fields();
    int[] srcIdx = new int[fields.length];
    DataType[] types = new DataType[fields.length];
    for (int i = 0; i < fields.length; i++) {
      if (fields[i].name().equals(MiniTable.GROUP_COL)) {
        srcIdx[i] = -1;
      } else {
        srcIdx[i] = tableSchema.fieldIndex(fields[i].name());
        types[i] = tableSchema.fields()[srcIdx[i]].dataType();
      }
    }
    ArrayList<ArrayList<InternalRow>> groups = MiniStore.groupsAt(key, snapshotId);
    ArrayList<InputPartition> parts = new ArrayList<>();
    for (int g = 0; g < MiniStore.NUM_GROUPS; g++) {
      if (groupRetained(g) && !groups.get(g).isEmpty()) {
        parts.add(new MiniInputPartition(g, groups.get(g), srcIdx, types));
      }
    }
    return parts.toArray(new InputPartition[0]);
  }

  @Override
  public PartitionReaderFactory createReaderFactory() {
    return new MiniReaderFactory();
  }

  static class MiniInputPartition implements InputPartition {
    final int groupId;
    final ArrayList<InternalRow> rows;
    final int[] srcIdx;
    final DataType[] types;

    MiniInputPartition(int groupId, ArrayList<InternalRow> rows, int[] srcIdx, DataType[] types) {
      this.groupId = groupId;
      this.rows = rows;
      this.srcIdx = srcIdx;
      this.types = types;
    }
  }

  static class MiniReaderFactory implements PartitionReaderFactory {
    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      final MiniInputPartition p = (MiniInputPartition) partition;
      final Iterator<InternalRow> it = p.rows.iterator();
      return new PartitionReader<InternalRow>() {
        private InternalRow current;

        @Override
        public boolean next() {
          if (it.hasNext()) {
            InternalRow full = it.next();
            Object[] vals = new Object[p.srcIdx.length];
            for (int i = 0; i < p.srcIdx.length; i++) {
              if (p.srcIdx[i] < 0) {
                vals[i] = p.groupId;
              } else if (p.srcIdx[i] >= full.numFields()) {
                // row written before an ALTER TABLE ADD COLUMN: null-pad
                vals[i] = null;
              } else {
                vals[i] = full.isNullAt(p.srcIdx[i]) ? null : full.get(p.srcIdx[i], p.types[i]);
              }
            }
            current = new GenericInternalRow(vals);
            return true;
          }
          return false;
        }

        @Override
        public InternalRow get() {
          return current;
        }

        @Override
        public void close() {}
      };
    }
  }
}
