package minicat;

import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperation;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * Group-based row-level operation over the whole table as one group: the
 * scan reads all rows, Spark's ReplaceData plan computes the merged /
 * updated / deleted row set, and the write's commit swaps in the
 * replacement — copy-on-write MERGE semantics, exactly what the reference's
 * rerun-overwrites behavior maps to (SURVEY.md §2.3 J4).
 */
public class MiniRowLevelOperation implements RowLevelOperation {
  private final String key;
  private final StructType tableSchema;
  private final Command cmd;

  MiniRowLevelOperation(String key, StructType tableSchema, Command cmd) {
    this.key = key;
    this.tableSchema = tableSchema;
    this.cmd = cmd;
  }

  @Override
  public Command command() {
    return cmd;
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    return new MiniScan(key, tableSchema);
  }

  @Override
  public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    return new MiniWriteBuilder(key, tableSchema, true, true);
  }
}
