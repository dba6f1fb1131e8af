package minicat;

import java.util.ArrayList;
import java.util.EnumSet;
import java.util.Iterator;
import java.util.Set;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * Iceberg-style metadata table: {@code SELECT * FROM mini.ns.`t$groups`}
 * lists (group, version, n_rows, snapshot) per storage group — the analog
 * of Iceberg's {@code t.files} — so tests (and users) can observe that a
 * group-scoped MERGE bumped only the matched groups' versions.
 */
public final class MiniGroupsTable implements Table, SupportsRead {
  static final StructType SCHEMA =
      new StructType()
          .add("group", DataTypes.IntegerType, false)
          .add("version", DataTypes.LongType, false)
          .add("n_rows", DataTypes.LongType, false)
          .add("snapshot", DataTypes.LongType, false);

  private final String key;
  private final String tableName;

  MiniGroupsTable(String key, String tableName) {
    this.key = key;
    this.tableName = tableName;
  }

  @Override
  public String name() {
    return tableName;
  }

  @Override
  public StructType schema() {
    return SCHEMA;
  }

  @Override
  public Set<TableCapability> capabilities() {
    return EnumSet.of(TableCapability.BATCH_READ);
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    final String k = key;
    return () ->
        new Scan() {
          @Override
          public StructType readSchema() {
            return SCHEMA;
          }

          @Override
          public Batch toBatch() {
            return new GroupsBatch(k);
          }
        };
  }

  static final class GroupsBatch implements Batch {
    private final String key;

    GroupsBatch(String key) {
      this.key = key;
    }

    @Override
    public InputPartition[] planInputPartitions() {
      Object[] stats = MiniStore.groupStats(key); // atomic: no torn rows
      long[] versions = (long[]) stats[0];
      long[] counts = (long[]) stats[1];
      long snap = (Long) stats[2];
      ArrayList<InternalRow> rows = new ArrayList<>();
      for (int g = 0; g < MiniStore.NUM_GROUPS; g++) {
        rows.add(
            new GenericInternalRow(new Object[] {g, versions[g], counts[g], snap}));
      }
      return new InputPartition[] {new RowsPartition(rows)};
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      return new RowsReaderFactory();
    }
  }

  static final class RowsReaderFactory implements PartitionReaderFactory {
    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      final Iterator<InternalRow> it = ((RowsPartition) partition).rows.iterator();
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

  static final class RowsPartition implements InputPartition {
    final ArrayList<InternalRow> rows;

    RowsPartition(ArrayList<InternalRow> rows) {
      this.rows = rows;
    }
  }
}
