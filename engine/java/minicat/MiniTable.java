package minicat;

import java.util.EnumSet;
import java.util.Set;

import org.apache.spark.sql.connector.catalog.MetadataColumn;
import org.apache.spark.sql.connector.catalog.SupportsMetadataColumns;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperationBuilder;
import org.apache.spark.sql.connector.write.RowLevelOperationInfo;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * A MiniCatalog table: batch read + batch write + GROUP-BASED row-level
 * operations over NUM_GROUPS hash-bucket storage groups (r4 — previously the
 * whole table was one group, so every MERGE rewrote every row). The
 * {@code _group} metadata column (Iceberg's {@code _file} analog) feeds
 * Spark's runtime group filtering, so ReplaceData rewrites only matched
 * groups; a snapshot-pinned instance (VERSION AS OF) is read-only.
 */
public class MiniTable
    implements Table, SupportsRead, SupportsWrite, SupportsRowLevelOperations,
        SupportsMetadataColumns {
  static final String GROUP_COL = "_group";

  private final String key;
  private final String tableName;
  private final StructType tableSchema;
  private final Long snapshotId; // null = current

  MiniTable(String key, String tableName, StructType tableSchema) {
    this(key, tableName, tableSchema, null);
  }

  MiniTable(String key, String tableName, StructType tableSchema, Long snapshotId) {
    this.key = key;
    this.tableName = tableName;
    this.tableSchema = tableSchema;
    this.snapshotId = snapshotId;
  }

  @Override
  public String name() {
    return tableName;
  }

  @Override
  public StructType schema() {
    return tableSchema;
  }

  @Override
  public MetadataColumn[] metadataColumns() {
    return new MetadataColumn[] {
      new MetadataColumn() {
        @Override
        public String name() {
          return GROUP_COL;
        }

        @Override
        public DataType dataType() {
          return DataTypes.IntegerType;
        }

        @Override
        public boolean isNullable() {
          return false;
        }

        @Override
        public String comment() {
          return "storage group id (Iceberg _file analog)";
        }
      }
    };
  }

  @Override
  public Set<TableCapability> capabilities() {
    return EnumSet.of(
        TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE);
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    return new MiniScan(key, tableSchema, snapshotId);
  }

  @Override
  public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    requireCurrent("write");
    return new MiniWriteBuilder(key, tableSchema, info.schema(), false, null);
  }

  @Override
  public RowLevelOperationBuilder newRowLevelOperationBuilder(RowLevelOperationInfo info) {
    requireCurrent("row-level operation");
    return () -> new MiniRowLevelOperation(key, tableSchema, info.command());
  }

  private void requireCurrent(String what) {
    if (snapshotId != null) {
      throw new UnsupportedOperationException(
          "cannot " + what + " on a VERSION AS OF snapshot (" + snapshotId + ")");
    }
  }
}
