package minicat;

import java.util.ArrayList;
import java.util.Iterator;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.types.StructType;

/**
 * Full-table scan: one input partition carrying a snapshot of the rows
 * (UnsafeRow copies — serializable, though local mode never ships them).
 * No column pruning / filter pushdown: Spark plans the Project/Filter above
 * the scan, which is correct (just not minimal) for a test catalog.
 */
public class MiniScan implements ScanBuilder, Scan, Batch {
  private final String key;
  private final StructType tableSchema;

  MiniScan(String key, StructType tableSchema) {
    this.key = key;
    this.tableSchema = tableSchema;
  }

  @Override
  public Scan build() {
    return this;
  }

  @Override
  public StructType readSchema() {
    return tableSchema;
  }

  @Override
  public Batch toBatch() {
    return this;
  }

  @Override
  public InputPartition[] planInputPartitions() {
    return new InputPartition[] {new MiniInputPartition(MiniStore.snapshot(key))};
  }

  @Override
  public PartitionReaderFactory createReaderFactory() {
    return new MiniReaderFactory();
  }

  static class MiniInputPartition implements InputPartition {
    final ArrayList<InternalRow> rows;

    MiniInputPartition(ArrayList<InternalRow> rows) {
      this.rows = rows;
    }
  }

  static class MiniReaderFactory implements PartitionReaderFactory {
    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      final Iterator<InternalRow> it = ((MiniInputPartition) partition).rows.iterator();
      return new PartitionReader<InternalRow>() {
        private InternalRow current;

        @Override
        public boolean next() {
          if (it.hasNext()) {
            current = it.next();
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
