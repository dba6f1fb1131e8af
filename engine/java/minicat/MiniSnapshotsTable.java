package minicat;

import java.util.ArrayList;
import java.util.EnumSet;
import java.util.Set;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * Iceberg-style snapshots metadata table (r5):
 * {@code SELECT * FROM mini.ns.`t$snapshots`} lists every RETAINED
 * snapshot with its total row count, how many groups it rewrote relative
 * to the previous retained snapshot (NULL for the oldest — and exact for
 * free, because copy-on-write means unchanged groups share list
 * identity), and whether it is the current snapshot — the analog of
 * Iceberg's {@code t.snapshots} with {@code summary} counts.
 */
public final class MiniSnapshotsTable implements Table, SupportsRead {
  static final StructType SCHEMA =
      new StructType()
          .add("snapshot_id", DataTypes.LongType, false)
          .add("total_rows", DataTypes.LongType, false)
          .add("groups_changed", DataTypes.LongType, true)
          .add("is_current", DataTypes.BooleanType, false);

  private final String key;
  private final String tableName;

  MiniSnapshotsTable(String key, String tableName) {
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
            return new SnapshotsBatch(k);
          }
        };
  }

  static final class SnapshotsBatch implements Batch {
    private final String key;

    SnapshotsBatch(String key) {
      this.key = key;
    }

    @Override
    public InputPartition[] planInputPartitions() {
      long[][] summary = MiniStore.snapshotSummary(key);
      ArrayList<InternalRow> rows = new ArrayList<>();
      for (long[] s : summary) {
        rows.add(
            new GenericInternalRow(
                new Object[] {
                  s[0], s[1], s[2] < 0 ? null : s[2], s[3] == 1L
                }));
      }
      return new InputPartition[] {new MiniGroupsTable.RowsPartition(rows)};
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      return new MiniGroupsTable.RowsReaderFactory();
    }
  }
}
