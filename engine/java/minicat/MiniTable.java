package minicat;

import java.util.EnumSet;
import java.util.Set;

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
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * A MiniCatalog table: batch read + batch write + GROUP-BASED row-level
 * operations with the whole table as the single group — the row-level scan
 * reads every row and the row-level write replaces every row, which is the
 * simplest shape Spark's ReplaceData plan supports (Iceberg's copy-on-write
 * mode with one data file, conceptually).
 */
public class MiniTable implements Table, SupportsRead, SupportsWrite, SupportsRowLevelOperations {
  private final String key;
  private final String tableName;
  private final StructType tableSchema;

  MiniTable(String key, String tableName, StructType tableSchema) {
    this.key = key;
    this.tableName = tableName;
    this.tableSchema = tableSchema;
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
  public Set<TableCapability> capabilities() {
    return EnumSet.of(
        TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE);
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    return new MiniScan(key, tableSchema);
  }

  @Override
  public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    return new MiniWriteBuilder(key, tableSchema, false, false);
  }

  @Override
  public RowLevelOperationBuilder newRowLevelOperationBuilder(RowLevelOperationInfo info) {
    return () -> new MiniRowLevelOperation(key, tableSchema, info.command());
  }
}
